"""Text retrieval over the documents corpus: BM25-style scoring.

A large-scale curation pipeline filters/ranks training documents by
relevance to probe queries (quality targeting, topic mixing). This
module implements the standard inverted-index BM25 shape Spark-first:

* term frequencies = one explode + groupBy (map-side combinable);
* document frequencies / query-term selection = vocabulary-sized aggs;
* the query side is tiny and BROADCAST onto the tf table — the big
  per-(doc, term) table is never shuffled more than once;
* per-term partial scores are pivoted into fixed columns so the final
  total is a fixed-order expression sum, not an order-undefined SUM.

Determinism note (why idf has no log): every float here derives from
integers through an identical expression tree on both engines —
divisions and multiplications are IEEE-exact given equal operands, so
Spark and DuckDB agree bit-for-bit. A `ln()` would instead go through
each engine's libm, which may differ in the last ulp and flip ranks.
We therefore use the raw Robertson–Spärck-Jones idf ratio
``(N - df + 0.5) / (df + 0.5)`` without the log. Ranking behavior is
the same monotone-in-df family; at 100 TB you would precompute idf as
a dimension table anyway.

Scale: tf is O(total tokens) rows but aggregates map-side; the query
term table is O(|query|) rows (broadcast); the only wide exchange is
the tf groupBy. Top-k is TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from argodb_mapreduce_spark.catalog import load_table
from argodb_mapreduce_spark.operators.similarity import (
    _SQL_NORMS,
    _SQL_WITH_SS,
    _sql_cos,
)
from argodb_mapreduce_spark.registry import register

#: BM25 constants (standard defaults). K1P1 is written literally so both
#: engines fold the same constant.
BM25_K1 = 1.2
BM25_B = 0.75
BM25_K1P1 = 2.2
N_QUERY_TERMS = 3
TOP_DOCS = 20


#: Shared BM25 CTE chain (toks..pivoted) — reused by the hybrid
#: RRF fusion oracle below.
_SQL_BM25_CTES = f"""toks AS (
      SELECT doc_id, tok
      FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
      WHERE tok <> ''
    ),
    tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS n_td
      FROM toks GROUP BY doc_id, tok
    ),
    vocab AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(n_td) AS BIGINT) AS cnt
      FROM tf GROUP BY tok
    ),
    qterms AS (
      SELECT tok, df, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, tok ASC) AS INT) AS qrank
      FROM vocab ORDER BY cnt DESC, tok ASC LIMIT {N_QUERY_TERMS}
    ),
    dl AS (
      SELECT doc_id,
             CAST(LENGTH(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS dl
      FROM documents
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM dl
    ),
    scored AS (
      SELECT tf.doc_id, q.qrank,
             ((CAST(s.n_docs - q.df AS DOUBLE) + 0.5) / (CAST(q.df AS DOUBLE) + 0.5))
             * ((CAST(tf.n_td AS DOUBLE) * {BM25_K1P1})
                / (CAST(tf.n_td AS DOUBLE)
                   + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * CAST(dl.dl AS DOUBLE) / s.avgdl)))
             AS score
      FROM tf
      JOIN qterms q ON tf.tok = q.tok
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
    ),
    pivoted AS (
      SELECT doc_id,
             COALESCE(MAX(CASE WHEN qrank = 1 THEN score END), 0.0) AS s1,
             COALESCE(MAX(CASE WHEN qrank = 2 THEN score END), 0.0) AS s2,
             COALESCE(MAX(CASE WHEN qrank = 3 THEN score END), 0.0) AS s3
      FROM scored GROUP BY doc_id
    )"""


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH {_SQL_BM25_CTES}
    SELECT doc_id, s1, s2, s3, s1 + s2 + s3 AS bm25
    FROM pivoted
    ORDER BY s1 + s2 + s3 DESC, doc_id ASC
    LIMIT {TOP_DOCS}
    """,
    tags=("text", "retrieval", "bm25"),
    doc=(
        f"BM25-style retrieval: score every document against the corpus's "
        f"{N_QUERY_TERMS} most frequent tokens (a deterministic, "
        "data-derived probe query), return the top-"
        f"{TOP_DOCS}. Log-free RSJ idf keeps both engines bit-identical "
        "(module docstring); per-term scores pivot into fixed columns so "
        "the total is a fixed-order sum."
    ),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # Empty tokens (leading/trailing/double spaces, empty docs) carry no
    # signal and would otherwise become a spuriously high-df "term" on
    # messy corpora — drop them from tf AND from document length.
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok")).filter(
        F.col("tok") != ""
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("n_td"))
    vocab = tf.groupBy("tok").agg(
        F.count(F.lit(1)).alias("df"), F.sum("n_td").alias("cnt")
    )
    # Probe query = top-N_QUERY_TERMS tokens: tiny, deterministic, and
    # computed as TakeOrderedAndProject + a 3-row window (never a global
    # rank over the vocabulary).
    qterms = (
        vocab.orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(N_QUERY_TERMS)
        .select(
            "tok",
            "df",
            F.row_number()
            .over(Window.orderBy(F.col("cnt").desc(), F.col("tok").asc()))
            .cast("int")
            .alias("qrank"),
        )
    )
    dl = d.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).cast("long").alias("dl"),
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias("avgdl"),
    )
    idf = (
        ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    tf_part = (F.col("n_td").cast("double") * F.lit(BM25_K1P1)) / (
        F.col("n_td").cast("double")
        + F.lit(BM25_K1)
        * (
            F.lit(1.0)
            - F.lit(BM25_B)
            + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("avgdl")
        )
    )
    scored = (
        tf.join(F.broadcast(qterms), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "qrank", (idf * tf_part).alias("score"))
    )
    pivoted = scored.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("qrank") == i, F.col("score"))), F.lit(0.0)
            ).alias(f"s{i}")
            for i in (1, 2, 3)
        ]
    )
    total = F.col("s1") + F.col("s2") + F.col("s3")
    return (
        pivoted.select("doc_id", "s1", "s2", "s3", total.alias("bm25"))
        .orderBy(total.desc(), F.col("doc_id").asc())
        .limit(TOP_DOCS)
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 + dense vectors fused by reciprocal rank
# ---------------------------------------------------------------------------

RRF_K = 60  #: the standard RRF smoothing constant (Cormack et al.)
VEC_TOPK = 20  #: dense candidates considered
HYBRID_TOPK = 10  #: fused results returned
PROBE_VEC = 0  #: deterministic probe: vec_id 0's embedding


@register(
    "retrieval_hybrid_rrf",
    oracle=f"""
    WITH {_SQL_BM25_CTES},
    lex AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY s1 + s2 + s3 DESC, doc_id ASC) AS INT) AS lex_rank
      FROM (SELECT doc_id, s1, s2, s3 FROM pivoted
            ORDER BY s1 + s2 + s3 DESC, doc_id ASC LIMIT {TOP_DOCS})
    ),
    qv AS ({_SQL_NORMS}),
    v AS ({_SQL_WITH_SS}),
    probe AS (SELECT qemb AS pq, ss AS pss FROM v WHERE vec_id = {PROBE_VEC}),
    cosined AS (
      SELECT a.vec_id AS doc_id,
             CAST({_sql_cos("a.qemb", "p.pq", "a.ss", "p.pss")} AS DOUBLE) AS cos_sim
      FROM v a CROSS JOIN probe p
      WHERE a.vec_id <> {PROBE_VEC}
    ),
    vec AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id ASC) AS INT) AS vec_rank
      FROM (SELECT * FROM cosined ORDER BY cos_sim DESC, doc_id ASC LIMIT {VEC_TOPK})
    )
    SELECT COALESCE(l.doc_id, vv.doc_id) AS doc_id,
           l.lex_rank AS lex_rank,
           vv.vec_rank AS vec_rank,
           COALESCE(1.0 / ({RRF_K} + l.lex_rank), 0.0)
             + COALESCE(1.0 / ({RRF_K} + vv.vec_rank), 0.0) AS rrf_score
    FROM lex l FULL OUTER JOIN vec vv ON l.doc_id = vv.doc_id
    ORDER BY rrf_score DESC, doc_id ASC
    LIMIT {HYBRID_TOPK}
    """,
    tags=("text", "retrieval", "vector", "hybrid"),
    doc=(
        f"HYBRID retrieval: the BM25 lexical top-{TOP_DOCS} and the "
        f"dense cosine top-{VEC_TOPK} (probe = vec_id {PROBE_VEC}'s "
        f"embedding over the id-aligned embeddings table) fused by "
        f"reciprocal rank — score = Σ 1/({RRF_K}+rank), the "
        f"Cormack/Clarke RRF that needs no score normalization across "
        f"heterogeneous rankers. A doc ranked by only one side "
        f"contributes that side's term alone (FULL OUTER fusion). "
        f"Rank arithmetic is 1/(int) in IEEE double — bit-identical on "
        f"both engines, so the fused ordering is oracle-exact."
    ),
)
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale design: each ranker's candidate set is top-k'd FIRST
    (TakeOrderedAndProject), so the fusion join touches k rows per
    ranker, not the corpus; the dense side is the exact scorer here but
    swaps for the IVF-PQ index path unchanged (same (doc_id, rank)
    contract). At 100 TB the rankers run as separate candidate
    generators and RRF is the cheap last-mile join — the standard
    architecture of a hybrid search stack."""
    from argodb_mapreduce_spark.operators.similarity import (
        _cosine,
        _dot,
        _quantize,
        _sq_norm,
    )

    lex = (
        text_bm25_topk(spark, sf_dir)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()))
            .cast("int")
            .alias("lex_rank"),
        )
    )
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _quantize(F.col("embedding")).alias("qemb")
    )
    v = e.select("vec_id", "qemb", _sq_norm(F.col("qemb")).alias("ss"))
    probe = v.filter(F.col("vec_id") == PROBE_VEC).select(
        F.col("qemb").alias("pq"), F.col("ss").alias("pss")
    )
    cosined = (
        v.filter(F.col("vec_id") != PROBE_VEC)
        .crossJoin(F.broadcast(probe))
        .select(
            F.col("vec_id").alias("doc_id"),
            _cosine(_dot(F.col("qemb"), F.col("pq")), F.col("ss"), F.col("pss")).alias(
                "cos_sim"
            ),
        )
    )
    vec = (
        cosined.orderBy(F.col("cos_sim").desc(), F.col("doc_id").asc())
        .limit(VEC_TOPK)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("cos_sim").desc(), F.col("doc_id").asc()))
            .cast("int")
            .alias("vec_rank"),
        )
    )
    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "vec_rank",
        (
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("vec_rank")), F.lit(0.0))
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc()).limit(
        HYBRID_TOPK
    )
