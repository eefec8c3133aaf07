"""Robust data-cleaning operators: MAD outlier screen and
winsorization (SURVEY.md §2.B3/B5 composite shapes; the data-quality
pass a training pipeline runs before aggregating a noisy measure).

Both are exact-rank-statistic shapes (no approx sketches): medians and
percentiles are picked by ROW_NUMBER selection with a unique-key
tie-break — the same engine-exact pattern as ``agg_median_manual`` —
so every emitted double is bit-identical to the DuckDB twin.

- ``events_anomaly_mad`` — robust per-group outlier screen: median and
  MAD (median absolute deviation) replace mean/stddev, so the screen
  itself is not corrupted by the outliers it hunts (the flaw of the
  3σ z-score screen, kept as ``events_anomaly_zscore`` for contrast).
- ``clean_winsorize`` — clip a measure to its [p05, p95] per-group
  rank percentiles and re-aggregate: the standard tail-taming pass
  before a mean-based metric.

Scale: each rank statistic is one window over (group, order-by) — a
shuffle on the group key, per-group data sorted within partitions.
That is the exact-percentile cost; at 100 TB the approximate path
(``sketch_rollup_quantile`` / ``profile_length_histogram``) trades
exactness for mergeable O(bins) state, and this module is the exact
twin the approximations are validated against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from argodb_mapreduce_spark.catalog import load_table
from argodb_mapreduce_spark.functions.oracle_safe import dsum, sql_dsum
from argodb_mapreduce_spark.registry import register

#: Robust z threshold: 3.5 is the conventional MAD-screen cutoff; the
#: 1.4826 factor scales MAD to the stddev of a normal distribution.
MAD_K = 1.4826
MAD_Z = 3.5


def _median_rank_filter(rn: str, n: str) -> str:
    return f"{rn} IN (({n} + 1) // 2, ({n} + 2) // 2)"


@register(
    "events_anomaly_mad",
    oracle=f"""
    WITH ranked AS (
      SELECT event_type, value, event_id,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ), med AS (
      SELECT event_type,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS median_value
      FROM ranked WHERE {_median_rank_filter("rn", "n")} GROUP BY event_type
    ), dev AS (
      SELECT e.event_type, e.event_id, e.value,
             ABS(e.value - m.median_value) AS d
      FROM events e JOIN med m ON m.event_type = e.event_type
    ), dranked AS (
      SELECT event_type, event_id, value, d,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d ASC, event_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM dev
    ), mad AS (
      SELECT event_type,
             CAST(CAST(SUM(CAST(d AS DECIMAL(18,12))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS mad_value
      FROM dranked WHERE {_median_rank_filter("rn", "n")} GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           m.median_value,
           a.mad_value,
           CAST(SUM(CASE WHEN d.d > {MAD_Z!r} * ({MAD_K!r} * a.mad_value) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM dev d
    JOIN med m ON m.event_type = d.event_type
    JOIN mad a ON a.event_type = d.event_type
    GROUP BY d.event_type, m.median_value, a.mad_value
    """,
    tags=("analytics", "cleaning", "robust"),
    doc=(
        "Robust MAD outlier screen: per event_type median and median-"
        "absolute-deviation by exact rank selection, then count values "
        f"with robust z > {MAD_Z} (MAD scaled by {MAD_K}). Unlike the 3σ "
        "z-score screen, median/MAD are not dragged by the outliers "
        "themselves — the robust twin of events_anomaly_zscore."
    ),
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    w = Window.partitionBy("event_type").orderBy(F.col("value").asc(), F.col("event_id").asc())
    wc = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    mid = (F.col("rn") == F.floor((F.col("n") + 1) / 2)) | (F.col("rn") == F.floor((F.col("n") + 2) / 2))
    med = (
        ranked.filter(mid)
        .groupBy("event_type")
        .agg(
            (F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1))).alias(
                "median_value"
            )
        )
    )
    dev = e.join(med, "event_type").select(
        "event_type",
        "event_id",
        "value",
        "median_value",
        F.abs(F.col("value") - F.col("median_value")).alias("d"),
    )
    wd = Window.partitionBy("event_type").orderBy(F.col("d").asc(), F.col("event_id").asc())
    dranked = dev.select(
        "event_type",
        "d",
        F.row_number().over(wd).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    # Deviations are |2-decimal − median|: the median of two middles can
    # carry a half-cent, so the exact-decimal sum uses scale 12 — still
    # a decimal-grid value (no irrational ops), dsum territory.
    mad = (
        dranked.filter(mid)
        .groupBy("event_type")
        .agg(
            (F.sum(F.col("d").cast("decimal(18,12)")).cast("double") / F.count(F.lit(1))).alias(
                "mad_value"
            )
        )
    )
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type", "median_value", "mad_value")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("d") > F.lit(MAD_Z) * (F.lit(MAD_K) * F.col("mad_value")), 1).otherwise(0)
            ).alias("n_outliers"),
        )
        .select("event_type", "n", "median_value", "mad_value", "n_outliers")
    )


#: Winsorization bounds: clip to the [P_LO, P_HI] rank percentiles.
P_LO = 0.05
P_HI = 0.95


@register(
    "clean_winsorize",
    oracle=f"""
    WITH ranked AS (
      SELECT event_type, value, event_id,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ), bounds AS (
      SELECT event_type,
             MIN(CASE WHEN rn = GREATEST(1, CAST(CEIL({P_LO!r} * n) AS BIGINT)) THEN value END) AS lo,
             MIN(CASE WHEN rn = CAST(CEIL({P_HI!r} * n) AS BIGINT) THEN value END) AS hi
      FROM ranked GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           b.lo, b.hi,
           CAST(SUM(CASE WHEN e.value < b.lo OR e.value > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           {sql_dsum("LEAST(GREATEST(e.value, b.lo), b.hi)", 2)} AS winsorized_sum
    FROM events e JOIN bounds b ON b.event_type = e.event_type
    GROUP BY e.event_type, b.lo, b.hi
    """,
    tags=("analytics", "cleaning", "robust"),
    doc=(
        f"Winsorization: clip value to its per-group [{P_LO:.0%}, "
        f"{P_HI:.0%}] exact rank percentiles (ROW_NUMBER selection, "
        "unique tie-break) and re-aggregate — the tail-taming pass "
        "before mean-based metrics. Clipped values stay on the 2-decimal "
        "grid (clip endpoints are actual data elements), so the "
        "exact-decimal sum applies."
    ),
)
def clean_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    w = Window.partitionBy("event_type").orderBy(F.col("value").asc(), F.col("event_id").asc())
    wc = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    lo_rank = F.greatest(F.lit(1).cast("long"), F.ceil(F.lit(P_LO) * F.col("n")))
    hi_rank = F.ceil(F.lit(P_HI) * F.col("n"))
    bounds = ranked.groupBy("event_type").agg(
        F.min(F.when(F.col("rn") == lo_rank, F.col("value"))).alias("lo"),
        F.min(F.when(F.col("rn") == hi_rank, F.col("value"))).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        e.join(bounds, "event_type")
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")), 1).otherwise(0)
            ).alias("n_clipped"),
            dsum(clipped, 2).alias("winsorized_sum"),
        )
        .select("event_type", "n", "lo", "hi", "n_clipped", "winsorized_sum")
    )
