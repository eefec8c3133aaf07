"""Advanced join shapes Spark lacks as single operators (SURVEY.md §2.C).

As-of join and banded range join — the two non-equi joins a reference
user would otherwise hand-roll in MapReduce. Both are expressed as
compositions of built-in operators (guide preference (a)): the as-of
join is the union+ordered-window formulation — one shuffle on
(key, time), no per-group Python, skew-safe — and the band join is a
broadcast nested-loop with a range predicate.

The as-of oracle uses DuckDB's native ASOF LEFT JOIN, so our
composition is checked against an independent first-class
implementation of the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from argodb_mapreduce_spark.catalog import load_table
from argodb_mapreduce_spark.registry import register


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right.ts <= left.ts on the same key (inclusive, left-outer).

    Union-tag formulation: interleave both inputs ordered by
    (ts, side, tiebreak) per key, then carry the last-seen right
    attributes forward with last(ignorenulls) over an unbounded-
    preceding frame. One shuffle total; scales as a plain window.
    """
    lcols = left.columns
    tagged_l = left.select(*lcols, *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"r_{c}") for c in right_cols], F.lit(1).alias("side"))
    tagged_r = right.select(
        *[F.col(c) if c in (key, ts) else F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) for c in lcols],
        *[F.col(c).alias(f"r_{c}") for c in right_cols],
        F.lit(0).alias("side"),
    )
    # side=0 (right) sorts before side=1 (left) at equal ts → inclusive <=.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged_l.unionByName(tagged_r).select(
        *lcols,
        "side",
        *[F.last(f"r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}") for c in right_cols],
    )
    return carried.filter(F.col("side") == 1).drop("side")


@register(
    "join_asof",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           e.event_id AS asof_event_id, e.ts AS asof_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id AND p.ts >= e.ts
    """,
    tags=("join", "asof"),
    doc=(
        "As-of join: each purchase paired with the user's most recent "
        "prior-or-simultaneous error. Union+window composition checked "
        "against DuckDB's native ASOF LEFT JOIN."
    ),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    errors = e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    out = asof_join(purchases, errors, key="user_id", ts="ts", right_cols=["event_id", "ts"])
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_event_id").alias("asof_event_id"),
        F.col("asof_ts").alias("asof_ts"),
    )


@register(
    "join_range_bands",
    oracle="""
    WITH bands(band_id, lo, hi) AS (
      SELECT band_id, band_id * 60000.0 AS lo, (band_id + 1) * 60000.0 AS hi
      FROM UNNEST(range(0, 10)) AS u(band_id)
    )
    SELECT b.band_id, COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS band_total
    FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band_id
    """,
    tags=("join", "range"),
    doc=(
        "Banded range (theta) join: orders bucketed into price bands via "
        "a broadcast nested-loop join with a range predicate — the "
        "cross-join+predicate building block for general theta joins."
    ),
)
def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bands = spark.range(0, 10).select(
        F.col("id").cast("long").alias("band_id"),
        (F.col("id") * 60000.0).alias("lo"),
        ((F.col("id") + 1) * 60000.0).alias("hi"),
    )
    from argodb_mapreduce_spark.functions.oracle_safe import dsum

    return (
        o.join(F.broadcast(bands), (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi))
        .groupBy("band_id")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", 2).alias("band_total"))
    )


@register(
    "join_asof_tolerance",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           CASE WHEN e.ts >= p.ts - INTERVAL 1 HOUR THEN e.event_id END AS asof_event_id,
           CASE WHEN e.ts >= p.ts - INTERVAL 1 HOUR THEN e.ts END AS asof_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id AND p.ts >= e.ts
    """,
    tags=("join", "asof"),
    doc=(
        "As-of join with a 1-hour tolerance: a match staler than the "
        "bound is rejected (NULLed), the standard guard in time-series "
        "feature joins against attaching ancient state. Correctly "
        "composes with most-recent-wins: if the newest prior right row "
        "is too old, every other candidate is older still, so a "
        "post-filter on the as-of result is exactly the tolerance "
        "semantics — no second pass over the data."
    ),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    errors = e.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    out = asof_join(purchases, errors, key="user_id", ts="ts", right_cols=["event_id", "ts"])
    fresh = F.col("asof_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.when(fresh, F.col("asof_event_id")).alias("asof_event_id"),
        F.when(fresh, F.col("asof_ts")).alias("asof_ts"),
    )


# ---------------------------------------------------------------------------
# Runtime bloom-filter join pruning (the non-partitioned twin of DPP).
# ---------------------------------------------------------------------------

@register(
    "join_bloom_pruned",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS sum_qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#33'
    """,
    tags=("join", "runtime-filter"),
    doc=(
        "Selective dim filter joined to the fact table with Spark's "
        "runtime bloom-filter injection enabled (InjectRuntimeFilter): "
        "for shuffle joins, the planner builds a bloom filter from the "
        "filtered build side and applies might_contain() on the fact "
        "scan — row groups full of non-matching keys are skipped before "
        "the shuffle, the non-partitioned twin of scan_partition_dynamic's "
        "DPP. At fixture scale AQE turns this join into a broadcast "
        "(which already prunes map-side), so the bloom path is proven "
        "separately with broadcast disabled in "
        "tests/test_plans.py::test_runtime_bloom_filter_prunes_fact_side; this "
        "query keeps the enabling confs a 100 TB user would set and "
        "oracles the join result."
    ),
)
def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Thresholds a large-cluster deployment would set: always consider
    # the filtered build side (creation threshold up) and never skip
    # injection because the probe side looks small (application
    # threshold down). Semantics are unaffected; harmless session-wide.
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#33").select("p_partkey")
    j = l.join(p, l.l_partkey == p.p_partkey)
    return j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("string").alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# Null-safe equality join (<=> / IS NOT DISTINCT FROM).
# ---------------------------------------------------------------------------

@register(
    "join_null_safe",
    oracle="""
    WITH l AS (
      SELECT CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS k,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    ), r AS (
      SELECT CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS k,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events GROUP BY 1
    )
    SELECT l.k, l.n_events, r.n_users
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    """,
    tags=("join", "null-semantics"),
    doc=(
        "Null-safe equality join (Spark <=> / SQL IS NOT DISTINCT "
        "FROM): NULL keys match each other instead of silently dropping "
        "— the semantics a fact/dim join needs when the key is a "
        "nullable derived category (here event_type with 'error' "
        "nulled). A plain equi-join would lose the NULL group on both "
        "sides; the result proves the NULL row survives. Executes as an "
        "ordinary hash join (null-safe equality is still an equi-key "
        "for partitioning: NULL hashes to a single partition — if NULLs "
        "were the majority key that's the usual salting territory)."
    ),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("event_type"))
    left = e.groupBy(k.alias("k")).agg(F.count(F.lit(1)).alias("n_events"))
    right = e.groupBy(k.alias("k")).agg(F.countDistinct("user_id").alias("n_users"))
    lft = left.alias("l")
    rgt = right.alias("r")
    return lft.join(rgt, F.col("l.k").eqNullSafe(F.col("r.k"))).select(
        F.col("l.k").alias("k"), "n_events", "n_users"
    )
