"""End-to-end corpus curation pipeline (SURVEY.md §2.C composite).

The single-query form of a pretraining-data curation pass: quality
scoring → threshold filter → exact content dedup → per-document token
stats, expressed as ONE declarative plan so Catalyst fuses the scoring
into the scan projection and the whole pipeline runs with exactly one
shuffle (the content-hash window). This is the shape a 100 TB curation
job should take — not a chain of materialized intermediate tables.

Building blocks mirror `functions/text.py` (quality heuristics) and
`operators/dedup.py` (sha256 exact dedup); the composite proves they
compose losslessly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from argodb_mapreduce_spark.catalog import load_table
from argodb_mapreduce_spark.functions.text import _STOPWORDS
from argodb_mapreduce_spark.registry import register

QUALITY_MIN = 2


@register(
    "curation_pipeline",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, text,
             len(string_split(text, ' ')) AS n_tokens,
             (CASE WHEN len(string_split(text, ' ')) >= 20 THEN 1 ELSE 0 END
              + CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                              w -> list_contains({_STOPWORDS!r}, w))) AS DOUBLE)
                          / len(string_split(text, ' ')) BETWEEN 0.01 AND 0.5 THEN 1 ELSE 0 END
              + CASE WHEN CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE)
                          / LENGTH(text) < 0.1 THEN 1 ELSE 0 END) AS quality_score
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, n_tokens, quality_score,
             ROW_NUMBER() OVER (PARTITION BY sha256(text) ORDER BY doc_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY sha256(text)) AS n_copies
      FROM scored
      WHERE quality_score >= {QUALITY_MIN}
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           quality_score, CAST(n_copies AS BIGINT) AS n_copies
    FROM ranked WHERE rn = 1
    """,
    tags=("curation", "dedup", "text", "pipeline"),
    doc=(
        "Composite curation pass: C4-style quality score >= "
        f"{QUALITY_MIN}, exact sha256 dedup keeping the lowest doc_id "
        "(with the duplicate count), and per-survivor token counts — one "
        "declarative plan, one shuffle (the content-hash window); scoring "
        "runs map-side fused into the scan."
    ),
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    stop_ratio = F.size(F.filter(toks, lambda w: w.isin(*_STOPWORDS))).cast("double") / n_tok
    punct_ratio = F.regexp_count(F.col("text"), F.lit("[^a-z0-9 ]")).cast("double") / F.length("text")
    quality = (
        F.when(n_tok >= 20, 1).otherwise(0)
        + F.when(stop_ratio.between(0.01, 0.5), 1).otherwise(0)
        + F.when(punct_ratio < 0.1, 1).otherwise(0)
    )
    scored = d.select(
        "doc_id", "text", n_tok.cast("long").alias("n_tokens"), quality.alias("quality_score")
    ).filter(F.col("quality_score") >= QUALITY_MIN)
    w = Window.partitionBy(F.sha2("text", 256))
    ranked = scored.select(
        "doc_id",
        "n_tokens",
        "quality_score",
        F.row_number().over(w.orderBy(F.col("doc_id").asc())).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n_copies"),
    )
    return ranked.filter(F.col("rn") == 1).select("doc_id", "n_tokens", "quality_score", "n_copies")
