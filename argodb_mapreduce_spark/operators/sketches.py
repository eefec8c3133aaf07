"""Count-min sketch over the documents corpus — a second re-aggregatable
sketch alongside the HLL rollup (operators/analytics.py sketch_rollup_hll).

A 100 TB frequency profile can't keep the exact vocabulary in memory per
reporting dimension; the count-min sketch (Cormode & Muthukrishnan)
bounds each counter table at depth x width cells regardless of corpus
size, supports merge by cell-wise addition (so per-partition / per-day
sketches roll up like the HLL sketches do), and guarantees
``estimate >= exact`` with overestimate bounded by ~N/width per row.

Everything here is integer math on md5-derived hashes, so Spark and
DuckDB agree exactly — the sketch itself is deterministic, unlike
engine-internal approx aggregates (see COVERAGE.md note on why those
are tested by self-check instead).

Spark-first shape: the corpus collapses to its vocabulary FIRST (one
map-side-combinable groupBy — the only O(corpus) exchange), the sketch
is built from the weighted vocabulary (depth x width = 4 x 1024 cells),
and the probe joins are vocabulary-sized or smaller. The per-(depth,
slot) counter aggregation is exactly how per-day sketch shards would
merge: cell-wise SUM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from argodb_mapreduce_spark.catalog import load_table
from argodb_mapreduce_spark.registry import register

CMS_DEPTH = 4
CMS_WIDTH = 1024
CMS_TOP = 10


def _slot_expr(i: int, tok: str = "tok") -> str:
    """Spark SQL: row-``i`` CMS slot for a token — 60 bits of
    md5("cms{i}:" || tok) mod width. Positive (< 2^60), engine-exact."""
    return (
        f"cast(conv(substring(md5(concat('cms{i}:', {tok})), 1, 15), 16, 10) as bigint) "
        f"% {CMS_WIDTH}"
    )


def _sql_slot(i: int, tok: str = "tok") -> str:
    """DuckDB twin of :func:`_slot_expr` (hex-literal cast, same value)."""
    return (
        f"CAST(('0x' || substring(md5('cms{i}:' || {tok}), 1, 15)) AS BIGINT) % {CMS_WIDTH}"
    )


@register(
    "sketch_count_min",
    oracle=f"""
    WITH toks AS (
      SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents
    ),
    vocab AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_exact FROM toks GROUP BY tok
    ),
    cells AS (
      SELECT d.d AS depth,
             CASE d.d
               {" ".join(f"WHEN {i} THEN {_sql_slot(i)}" for i in range(CMS_DEPTH))}
             END AS slot,
             n_exact
      FROM vocab, UNNEST([{", ".join(str(i) for i in range(CMS_DEPTH))}]) AS d(d)
    ),
    counters AS (
      SELECT depth, slot, CAST(SUM(n_exact) AS BIGINT) AS cell
      FROM cells GROUP BY depth, slot
    ),
    top AS (
      SELECT tok, n_exact FROM vocab ORDER BY n_exact DESC, tok ASC LIMIT {CMS_TOP}
    ),
    probes AS (
      SELECT t.tok, t.n_exact, d.d AS depth,
             CASE d.d
               {" ".join(f"WHEN {i} THEN {_sql_slot(i, 't.tok')}" for i in range(CMS_DEPTH))}
             END AS slot
      FROM top t, UNNEST([{", ".join(str(i) for i in range(CMS_DEPTH))}]) AS d(d)
    )
    SELECT p.tok, p.n_exact, CAST(MIN(c.cell) AS BIGINT) AS n_cms,
           MIN(c.cell) >= p.n_exact AS never_underestimates
    FROM probes p JOIN counters c ON c.depth = p.depth AND c.slot = p.slot
    GROUP BY p.tok, p.n_exact
    """,
    tags=("sketch", "text", "frequency"),
    doc=(
        f"Count-min sketch ({CMS_DEPTH}x{CMS_WIDTH}, md5-hashed rows) over "
        f"corpus token frequencies: build the counter table, probe the "
        f"exact top-{CMS_TOP} tokens, return exact vs estimate with the "
        "never-underestimates guarantee as a checked column. Cell-wise "
        "SUM is the merge operator — per-day shards roll up like the HLL "
        "sketches."
    ),
)
def sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    # Sketch build: vocabulary x depth rows -> (depth, slot) cells.
    cells = vocab.select(
        "n_exact",
        F.posexplode(
            F.array(*[F.expr(_slot_expr(i)) for i in range(CMS_DEPTH)])
        ).alias("depth", "slot"),
    )
    counters = cells.groupBy("depth", "slot").agg(F.sum("n_exact").alias("cell"))
    # Probe the exact heavy hitters (distributed top-k, then the tiny
    # probe side broadcasts onto the counter table).
    top = vocab.orderBy(F.col("n_exact").desc(), F.col("tok").asc()).limit(CMS_TOP)
    probes = top.select(
        "tok",
        "n_exact",
        F.posexplode(
            F.array(*[F.expr(_slot_expr(i)) for i in range(CMS_DEPTH)])
        ).alias("depth", "slot"),
    )
    return (
        counters.join(F.broadcast(probes), ["depth", "slot"])
        .groupBy("tok", "n_exact")
        .agg(
            F.min("cell").alias("n_cms"),
            (F.min("cell") >= F.col("n_exact")).alias("never_underestimates"),
        )
    )
