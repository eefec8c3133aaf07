"""Statistical aggregates with engine-exact arithmetic (SURVEY.md §2.B3).

stddev/variance are computed from exact decimal sums via the explicit
textbook formula on both sides (never the engines' built-in stddev,
whose streaming/pairwise update orders differ in the last ulp), and
median is an explicit rank-based selection — both remain bit-identical
across engines and across any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from argodb_mapreduce_spark.catalog import load_table
from argodb_mapreduce_spark.registry import register


@register(
    "agg_stats_variance",
    oracle="""
    WITH sums AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sx2
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           sx / n AS mean_qty,
           (sx2 - sx * sx / n) / (n - 1) AS var_qty,
           SQRT((sx2 - sx * sx / n) / (n - 1)) AS stddev_qty
    FROM sums
    """,
    tags=("agg", "stats"),
    doc="Sample variance/stddev from exact decimal sums (sum-of-squares formula, deterministic at any parallelism).",
)
def agg_stats_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sx"),
        F.sum((F.col("l_quantity") * F.col("l_quantity")).cast("decimal(18,4)")).cast("double").alias("sx2"),
    )
    var = (F.col("sx2") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)
    return sums.select(
        "l_returnflag",
        "n",
        (F.col("sx") / F.col("n")).alias("mean_qty"),
        var.alias("var_qty"),
        F.sqrt(var).alias("stddev_qty"),
    )


@register(
    "agg_median_manual",
    oracle="""
    WITH ranked AS (
      SELECT o_orderstatus, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
      FROM orders
    )
    SELECT o_orderstatus,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS median_price
    FROM ranked
    WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
    GROUP BY o_orderstatus
    """,
    tags=("agg", "stats"),
    doc=(
        "Exact median by rank selection: pick the middle element(s) with a "
        "window, average over the selected rows (1 row for odd groups, 2 "
        "for even — dividing by COUNT(*) instead of a hard-coded 2 keeps "
        "the odd case correct)."
    ),
)
def agg_median_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase exact median (functions/rank_stats.py): the fact table
    reduces to a per-(status, price) histogram first, so the rank
    window sorts distinct prices — bounded by the 2-decimal price
    domain — instead of every order row (3 statuses = 3 fact-scale
    window partitions in the old per-row shape). Selection by rank over
    sorted values is tie-agnostic, so this matches the oracle's
    ROW_NUMBER/o_orderkey tie-break bit-for-bit."""
    from argodb_mapreduce_spark.functions.rank_stats import median_exact, rank_histogram

    o = load_table(spark, sf_dir, "orders")
    h = rank_histogram(o, "o_orderstatus", "o_totalprice")
    return h.groupBy("o_orderstatus").agg(
        median_exact("o_totalprice", 2).alias("median_price")
    )


@register(
    "agg_percentile_selfcheck",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n, TRUE AS p50_ok, TRUE AS p90_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "stats", "approx"),
    doc=(
        "percentile_approx self-validated against the exact percentile: "
        "the approximate p50/p90 must land within 5%% of exact. Only the "
        "deterministic group key, count, and pass/fail flags are emitted so "
        "the DuckDB oracle can hash-match (the sketch estimates themselves "
        "are engine-internal; SURVEY.md §5.3)."
    ),
)
def agg_percentile_selfcheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile_approx(l_extendedprice, 0.5)").alias("p50_approx"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50_exact"),
        F.expr("percentile_approx(l_extendedprice, 0.9)").alias("p90_approx"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90_exact"),
    )
    return g.select(
        "l_returnflag",
        "n",
        ((F.abs(F.col("p50_approx") - F.col("p50_exact")) / F.col("p50_exact")) <= 0.05).alias("p50_ok"),
        ((F.abs(F.col("p90_approx") - F.col("p90_exact")) / F.col("p90_exact")) <= 0.05).alias("p90_ok"),
    )


@register(
    "agg_correlation",
    oracle="""
    WITH sums AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sx2,
             CAST(CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(24,4))) AS VARCHAR) AS DOUBLE) AS sy2,
             CAST(CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(24,4))) AS VARCHAR) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (sxy - sx * sy / n) / ((n - 1) * SQRT((sx2 - sx * sx / n) / (n - 1)) * SQRT((sy2 - sy * sy / n) / (n - 1))) AS corr_qty_price
    FROM sums
    """,
    tags=("agg", "stats"),
    doc="Pearson correlation from exact decimal sums (never the engines' streaming corr — update order differs).",
)
def agg_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    p = F.col("l_extendedprice")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q.cast("decimal(18,2)")).cast("double").alias("sx"),
        F.sum(p.cast("decimal(18,2)")).cast("double").alias("sy"),
        F.sum((q * q).cast("decimal(18,4)")).cast("double").alias("sx2"),
        F.sum((p * p).cast("decimal(24,4)")).cast("double").alias("sy2"),
        F.sum((q * p).cast("decimal(24,4)")).cast("double").alias("sxy"),
    )
    n = F.col("n")
    sdx = F.sqrt((F.col("sx2") - F.col("sx") * F.col("sx") / n) / (n - 1))
    sdy = F.sqrt((F.col("sy2") - F.col("sy") * F.col("sy") / n) / (n - 1))
    corr = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / ((n - 1) * sdx * sdy)
    return sums.select("l_returnflag", "n", corr.alias("corr_qty_price"))
