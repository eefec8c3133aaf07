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

Scale: both operators use the TWO-PHASE exact-rank shape
(``functions/rank_stats.py``): the fact table reduces to a bounded
per-(group, value) histogram first (value is a 2-decimal grid — the
histogram is O(|grid|) regardless of row count), and every rank window
runs over the histogram only. The old per-row window shape put each
event_type's entire fact partition through one sorter — with ~5 event
types that is 5 giant partitions at 100 TB; the histogram shape never
sorts more than |grid| rows per group and scans the fact table exactly
once. For measures with UNBOUNDED domains the approximate path
(``sketch_rollup_quantile`` / ``profile_length_histogram``) trades
exactness for mergeable O(bins) state, and this module is the exact
twin the approximations are validated against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from argodb_mapreduce_spark.catalog import load_table
from argodb_mapreduce_spark.functions.oracle_safe import sql_dsum
from argodb_mapreduce_spark.functions.rank_stats import (
    median_exact,
    rank_histogram,
    value_at_rank,
)
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
    """Two-phase exact rank shape (functions/rank_stats.py): the fact
    table reduces ONCE to a per-(event_type, value) histogram — value
    is a bounded 2-decimal grid, so the histogram is O(|grid|) rows no
    matter the corpus size — and every window (median rank, MAD rank)
    runs over histograms only. With ~5 event types, the old per-row
    rank windows were 5 fact-scale single partitions at 100 TB; the
    histogram never exceeds |grid| rows per group. The deviation
    histogram and the outlier counts are weighted re-aggregations of
    the value histogram, so the fact table is scanned exactly once."""
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    h = rank_histogram(e, "event_type", "value")
    med = h.groupBy("event_type").agg(median_exact("value", 2).alias("median_value"))
    # Deviations are |2-decimal − median|: the median of two middles can
    # carry a half-cent, so the exact-decimal sum uses scale 12 — still
    # a decimal-grid value (no irrational ops), dsum territory. Distinct
    # values can collide on the same |v - median|, hence the re-group.
    dev = (
        h.select("event_type", "value", "cnt")
        .join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            "median_value",
            F.abs(F.col("value") - F.col("median_value")).alias("d"),
            "cnt",
        )
    )
    dhist = dev.groupBy("event_type", "d").agg(F.sum("cnt").alias("cnt"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dh = dhist.select(
        "event_type",
        "d",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("event_type")).alias("n"),
    )
    mad = dh.groupBy("event_type").agg(median_exact("d", 12).alias("mad_value"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "median_value", "mad_value")
        .agg(
            F.sum("cnt").cast("long").alias("n"),
            F.sum(
                F.when(
                    F.col("d") > F.lit(MAD_Z) * (F.lit(MAD_K) * F.col("mad_value")), F.col("cnt")
                ).otherwise(F.lit(0))
            ).cast("long").alias("n_outliers"),
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
    """Two-phase exact rank shape (functions/rank_stats.py): percentile
    bounds are selected from the per-(event_type, value) histogram —
    the value at rank r is the smallest value whose cumulative count
    reaches r, identical to the oracle's ROW_NUMBER selection — and the
    clipped re-aggregation is a weighted pass over the same histogram,
    so the fact table is scanned exactly once and no window ever sees
    fact-scale input."""
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    h = rank_histogram(e, "event_type", "value")
    lo_rank = F.greatest(F.lit(1).cast("long"), F.ceil(F.lit(P_LO) * F.col("n")))
    hi_rank = F.ceil(F.lit(P_HI) * F.col("n"))
    bounds = h.groupBy("event_type").agg(
        value_at_rank("value", lo_rank).alias("lo"),
        value_at_rank("value", hi_rank).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        h.select("event_type", "value", "cnt")
        .join(F.broadcast(bounds), "event_type")
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.sum("cnt").cast("long").alias("n"),
            F.sum(
                F.when(
                    (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")), F.col("cnt")
                ).otherwise(F.lit(0))
            ).cast("long").alias("n_clipped"),
            # Weighted exact-decimal sum: v repeated c times sums to
            # exactly c * decimal(v) — same bits as the oracle's row sum.
            F.sum(F.col("cnt").cast("decimal(20,0)") * clipped.cast("decimal(18,2)"))
            .cast("double")
            .alias("winsorized_sum"),
        )
        .select("event_type", "n", "lo", "hi", "n_clipped", "winsorized_sum")
    )
