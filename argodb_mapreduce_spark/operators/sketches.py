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

from pyspark.sql import DataFrame, SparkSession, Window
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


N_BINS = 64
QUANTILES = (0.5, 0.9, 0.99)


@register(
    "sketch_rollup_quantile",
    oracle=f"""
    WITH stats AS (
      SELECT MIN(value) AS mn, MAX(value) AS mx, CAST(COUNT(*) AS BIGINT) AS n FROM events
    ),
    cells AS (
      SELECT CAST(ts AS DATE) AS day,
             LEAST(CAST(FLOOR((value - s.mn) / (s.mx - s.mn) * {N_BINS}.0) AS INT), {N_BINS - 1}) AS bin,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events, stats s GROUP BY 1, 2
    ),
    hist AS (
      SELECT bin, CAST(SUM(cnt) AS BIGINT) AS n_bin FROM cells GROUP BY bin
    ),
    cum AS (
      SELECT bin, n_bin, CAST(SUM(n_bin) OVER (ORDER BY bin) AS BIGINT) AS cum FROM hist
    ),
    qs AS (
      -- CAST to DOUBLE: DuckDB parses bare 0.99 as DECIMAL, whose exact
      -- q*n would diverge from Spark's IEEE double product (0.99*10000 =
      -- 9900.000000000002 -> CEIL 9901 in double, 9900 in decimal).
      SELECT UNNEST([{", ".join(f"CAST({q} AS DOUBLE)" for q in QUANTILES)}]) AS q
    )
    SELECT q.q AS quantile, c.bin, c.n_bin,
           CAST(CEIL(q.q * s.n) AS BIGINT) AS k,
           s.mn + (CAST(c.bin AS DOUBLE)
                   + CAST(CAST(CEIL(q.q * s.n) AS BIGINT) - (c.cum - c.n_bin) AS DOUBLE)
                     / CAST(c.n_bin AS DOUBLE))
                 * ((s.mx - s.mn) / {N_BINS}.0) AS est_value,
           s.n AS n_total
    FROM qs q, cum c, stats s
    WHERE c.cum - c.n_bin < CAST(CEIL(q.q * s.n) AS BIGINT)
      AND CAST(CEIL(q.q * s.n) AS BIGINT) <= c.cum
    """,
    tags=("sketch", "quantile", "rollup"),
    doc=(
        f"Mergeable quantile sketch rollup: per-day fixed-{N_BINS}-bin "
        "histograms of events.value merge by cell-wise SUM (same merge "
        "algebra as the HLL and count-min rollups), then p50/p90/p99 are "
        "estimated from the merged histogram by within-bin linear "
        "interpolation. All integer counts + one shared (min,max) frame, "
        "so the estimate is engine-exact — a deterministic stand-in for "
        "t-digest/KLL where the bin layout is fixed up front. At 100 TB "
        "the per-shard histogram is O(bins) state regardless of row "
        "count, and reporting dimensions roll up without re-scanning."
    ),
)
def sketch_rollup_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    stats = ev.agg(
        F.min("value").alias("mn"), F.max("value").alias("mx"), F.count(F.lit(1)).alias("n")
    )
    bin_col = F.least(
        F.floor((F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn")) * N_BINS).cast("int"),
        F.lit(N_BINS - 1),
    )
    # Per-day shards first, then cell-wise merge — the rollup contract.
    cells = (
        ev.crossJoin(F.broadcast(stats))
        .groupBy(F.to_date("ts").alias("day"), bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hist = cells.groupBy("bin").agg(F.sum("cnt").alias("n_bin"))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("bin", "n_bin", F.sum("n_bin").over(w).alias("cum"))
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in QUANTILES])).alias("q")
    )
    k = F.ceil(F.col("q") * F.col("n")).cast("long")
    frac = (k - (F.col("cum") - F.col("n_bin"))).cast("double") / F.col("n_bin").cast("double")
    est = F.col("mn") + (F.col("bin").cast("double") + frac) * (
        (F.col("mx") - F.col("mn")) / F.lit(float(N_BINS))
    )
    return (
        qs.crossJoin(cum)
        .crossJoin(F.broadcast(stats))
        .filter((F.col("cum") - F.col("n_bin") < k) & (k <= F.col("cum")))
        .select(
            F.col("q").alias("quantile"),
            "bin",
            "n_bin",
            k.alias("k"),
            est.alias("est_value"),
            F.col("n").alias("n_total"),
        )
    )
