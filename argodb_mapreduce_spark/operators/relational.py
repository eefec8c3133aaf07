"""Relational operator pack (SURVEY.md §2.B).

The reference feeds ``(NullWritable, HCatRecord)`` rows into arbitrary
MapReduce jobs (README.md:36-44 of the reference); users express
projection/filter/agg/join/sort with map/shuffle/reduce idioms. This
module provides each of those capabilities as first-class DataFrame
operators (§2.B1-B6/B8), declaratively, so Catalyst handles pushdown,
join strategy selection, partial aggregation and AQE re-planning — the
properties that make the same plans hold on a 1000-executor cluster.

Every query here is DuckDB-oracle-checked (exact value hash); double
aggregates use the exact-decimal convention from functions/oracle_safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from argodb_mapreduce_spark.catalog import load_table
from argodb_mapreduce_spark.functions.oracle_safe import davg, dsum, sql_davg, sql_dsum
from argodb_mapreduce_spark.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregation (B3): the flagship pricing-summary query — scan → filter →
# hash-agg with 8 aggregates → sort. MapReduce equivalent: map+combiner+
# reduce with a composite key; Spark does partial aggregation map-side
# automatically.
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 2)} AS sum_qty,
           {sql_dsum('l_extendedprice', 2)} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 6)} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
           {sql_davg('l_quantity', 2)} AS avg_qty,
           {sql_davg('l_extendedprice', 2)} AS avg_price,
           {sql_davg('l_discount', 2)} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
    doc="TPC-H Q1-style pricing summary: the reference's scan feeding a map/combine/reduce aggregation (SURVEY.md §2.B3).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", 2).alias("sum_qty"),
            dsum("l_extendedprice", 2).alias("sum_base_price"),
            dsum(disc_price, 6).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            davg("l_quantity", 2).alias("avg_qty"),
            davg("l_extendedprice", 2).alias("avg_price"),
            davg("l_discount", 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_minmax_distinct",
    oracle="""
    SELECT o_orderstatus,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           COUNT(DISTINCT o_custkey) AS n_custs,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg",),
    doc="min/max/count-distinct aggregation (SURVEY.md §2.B3). min/max of doubles are order-independent — no decimal detour needed.",
)
def agg_minmax_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.countDistinct("o_custkey").alias("n_custs"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders, CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_spent
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    """,
    tags=("agg",),
    doc="GROUP BY + HAVING (post-aggregation filter), SURVEY.md §2.B3.",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", 2).alias("total_spent"))
        .filter(F.col("n_orders") >= 12)
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty, COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
    doc="ROLLUP hierarchical subtotals (MapReduce users emulate with multi-job unions; SURVEY.md §2.B3/B6).",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity", 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
    doc="CUBE over two dims (SURVEY.md §2.B3).",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity", 2).alias("sum_qty"))
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    tags=("agg",),
    doc="GROUPING SETS (SQL surface; SURVEY.md §2.B3).",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'O') AS VARCHAR) AS DOUBLE) AS qty_O,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F') AS VARCHAR) AS DOUBLE) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
    doc="Pivot (wide aggregation) — Spark .pivot(), oracle via FILTER aggregates.",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")))
        .select(
            "l_returnflag",
            F.col("O").cast("double").alias("qty_O"),
            F.col("F").cast("double").alias("qty_F"),
        )
    )


@register(
    "agg_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
    doc=(
        "approx_count_distinct (HLL++) self-validated against the exact "
        "count. Only the group key, the exact count, and the within_5pct "
        "flag are emitted — the sketch estimate itself is engine-internal "
        "(DuckDB's approx sketch differs), so the contract row stays "
        "hash-checkable (SURVEY.md §5.3)."
    ),
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
            F.countDistinct("l_orderkey").alias("exact_orders"),
        )
        .select(
            "l_returnflag",
            "exact_orders",
            ((F.abs(F.col("approx_orders") - F.col("exact_orders")) / F.col("exact_orders")) <= 0.05).alias(
                "within_5pct"
            ),
        )
    )


@register(
    "agg_approx_percentile",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag,
           MAX(CASE WHEN rn = CAST(CEIL(0.50 * n) AS BIGINT)
                    THEN l_extendedprice END) AS p50_exact,
           MAX(CASE WHEN rn = CAST(CEIL(0.95 * n) AS BIGINT)
                    THEN l_extendedprice END) AS p95_exact,
           TRUE AS approx_within_1pct
    FROM ranked GROUP BY l_returnflag
    """,
    tags=("agg", "approx", "percentile"),
    doc=(
        "approx_percentile (KLL/GK-style mergeable quantile sketch, "
        "accuracy 10000) self-validated against the EXACT inverted-CDF "
        "percentile (the value at rank ceil(q*n), computed by "
        "distributed row_number — deterministic even under price ties, "
        "since the rank-th value of a value-ordered sort is tie-"
        "independent). Only the exact percentiles and the within-1pct "
        "flag are emitted: the sketch estimate itself is engine-internal "
        "(same contract as agg_approx_count_distinct). The sketch is the "
        "100 TB path — one pass, mergeable partials, no global sort; the "
        "exact rank is the oracle-checkable self-check."
    ),
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    wn = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    exact = ranked.groupBy("l_returnflag").agg(
        F.max(
            F.when(F.col("rn") == F.ceil(0.50 * F.col("n")), F.col("l_extendedprice"))
        ).alias("p50_exact"),
        F.max(
            F.when(F.col("rn") == F.ceil(0.95 * F.col("n")), F.col("l_extendedprice"))
        ).alias("p95_exact"),
    )
    approx = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.95], 10000).alias("pa")
    )
    return exact.join(approx, "l_returnflag").select(
        "l_returnflag",
        "p50_exact",
        "p95_exact",
        (
            (F.abs(F.col("pa")[0] - F.col("p50_exact")) / F.col("p50_exact") <= 0.01)
            & (F.abs(F.col("pa")[1] - F.col("p95_exact")) / F.col("p95_exact") <= 0.01)
        ).alias("approx_within_1pct"),
    )


# ---------------------------------------------------------------------------
# Joins (B4): reduce-side join ≙ shuffle join; map-side (distributed cache)
# join ≙ broadcast. Catalyst + AQE pick the physical strategy; broadcast is
# hinted where a dimension is known-small (the 100 TB-safe choice).
# ---------------------------------------------------------------------------

@register(
    "join_inner",
    oracle="""
    SELECT o_orderkey, o_orderdate, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    """,
    tags=("join",),
    doc="Inner equi-join orders⋈customer (reduce-side join in MapReduce terms, SURVEY.md §2.B4).",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_orderdate", "c_name", "c_mktsegment"
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus = 'F'
    """,
    tags=("join",),
    doc="Left outer join with a join-side predicate (nulls preserved on the left).",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "F")
    return c.join(o, cond, "left").select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "join_full_outer",
    oracle="""
    SELECT n_nationkey, n_name, agg.n_custs
    FROM nation FULL JOIN (
      SELECT c_nationkey, COUNT(*) AS n_custs FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
    ) agg ON n_nationkey = agg.c_nationkey
    """,
    tags=("join",),
    doc="Full outer join nation⟗(filtered customer counts): unmatched rows survive on both sides.",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    agg = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_custs"))
    )
    return n.join(agg, n.n_nationkey == agg.c_nationkey, "full").select(
        "n_nationkey", "n_name", "n_custs"
    )


@register(
    "join_semi",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 48)
    """,
    tags=("join",),
    doc="Left-semi join (EXISTS): orders having a high-quantity line item.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 48)
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_semi").select("o_orderkey", "o_totalprice")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join",),
    doc="Left-anti join (NOT EXISTS): customers with no orders.",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_cross",
    oracle="SELECT n_name, r_name FROM nation CROSS JOIN region",
    tags=("join",),
    doc="Cross join of two small dims (125 rows) — theta-join building block.",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "nation").crossJoin(_t(spark, sf_dir, "region")).select("n_name", "r_name")


@register(
    "join_broadcast_dim",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_items, CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 10
    GROUP BY p_brand
    """,
    tags=("join", "broadcast"),
    doc=(
        "Map-side join: small dim shipped to every task (MapReduce "
        "distributed-cache idiom, SURVEY.md §2.B4) ≙ broadcast hash join — "
        "no shuffle of the 100 TB fact side."
    ),
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_items"), dsum("l_quantity", 2).alias("sum_qty"))
    )


@register(
    "q3_top_unshipped",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
    doc="TPC-H Q3-style 3-way join + agg + deterministic top-10 (unique-key tie-break).",
)
def q3_top_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsum(revenue, 6).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "revenue", "o_orderdate")
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    tags=("join", "agg"),
    doc="TPC-H Q5-style 6-way snowflake join: Catalyst broadcast-joins every dim; only lineitem⋈orders shuffles.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(revenue, 6).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Sort / window / top-k per group (B5): MapReduce secondary-sort idioms.
# ---------------------------------------------------------------------------

@register(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
    """,
    tags=("sort",),
    doc="Global top-N: distributed sort + limit (take-ordered), deterministic via unique-key tie-break.",
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "window_rank",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           RANK()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS bal_rank,
           DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS bal_dense_rank,
           ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
    FROM customer
    """,
    tags=("window",),
    doc="rank/dense_rank/row_number over per-nation balance ordering (secondary sort, SURVEY.md §2.B5).",
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.row_number().over(w).alias("rn"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           LAG(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_order,
           LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS next_order
    FROM orders
    """,
    tags=("window",),
    doc="lag/lead navigation within per-customer order history.",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
    )


@register(
    "window_moving_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_spend,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
    FROM orders
    """,
    tags=("window",),
    doc=(
        "Moving/running sums with explicit frames. Exact-decimal inside the "
        "frame: engines evaluate sliding frames in different orders "
        "(Spark recompute vs DuckDB segment tree), so double would drift."
    ),
)
def window_moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(price_dec).over(w.rowsBetween(-2, 0)).cast("double").alias("moving_spend"),
        F.sum(price_dec).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double").alias("running_spend"),
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
    tags=("window", "topk"),
    doc="Top-3 per group via window row_number — shuffle-parallel, never a driver-side sort (100 TB stance).",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        _t(spark, sf_dir, "customer")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal")
    )


# ---------------------------------------------------------------------------
# Set operations / distinct (B6).
# ---------------------------------------------------------------------------

@register(
    "set_union_all",
    oracle="""
    SELECT c_custkey AS key, 'customer' AS src FROM customer WHERE c_acctbal > 9500
    UNION ALL
    SELECT o_orderkey AS key, 'order' AS src FROM orders WHERE o_totalprice > 400000
    """,
    tags=("setop",),
    doc="UNION ALL of two heterogeneous sources projected to a common schema.",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9500)
        .select(F.col("c_custkey").alias("key"), F.lit("customer").alias("src"))
    )
    b = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_orderkey").alias("key"), F.lit("order").alias("src"))
    )
    return a.unionAll(b)


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    tags=("setop",),
    doc="INTERSECT (distinct) of two key sets.",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
    tags=("setop",),
    doc="EXCEPT (distinct): customer keys never seen in orders.",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.subtract(o)


@register(
    "distinct_pairs",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("setop",),
    doc="SELECT DISTINCT (dedup by all projected columns).",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# Subqueries (SQL surface).
# ---------------------------------------------------------------------------

@register(
    "subquery_above_avg",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) FROM customer)
    """,
    tags=("subquery",),
    doc="Scalar subquery: customers above the mean balance (exact-decimal mean on both sides).",
)
def subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) FROM customer)
        """
    )


@register(
    "subquery_in",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      AND o_orderstatus = 'O'
    """,
    tags=("subquery",),
    doc="IN subquery (decorrelated by Catalyst into a left-semi join).",
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
          AND o_orderstatus = 'O'
        """
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    tags=("join", "agg", "subquery"),
    doc="TPC-H Q4-style: correlated EXISTS (semi-join) + aggregation.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate)
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q6_revenue_forecast",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount', 6)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("agg", "filter"),
    doc="TPC-H Q6-style: highly selective multi-predicate scan + single global aggregate (all predicates pushed to parquet).",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), 6).alias("revenue"))
    )


@register(
    "q10_top_returners",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue,
           c_acctbal
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    tags=("join", "agg", "topk"),
    doc="TPC-H Q10-style: returned-item revenue per customer, deterministic top-20.",
)
def q10_top_returners(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(dsum(revenue, 6).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal")
    )


@register(
    "q12_shipmode_buckets",
    oracle="""
    SELECT CAST(YEAR(l_shipdate) AS INT) AS ship_year,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1
    """,
    tags=("join", "agg", "conditional"),
    doc="TPC-H Q12-style: conditional counting buckets inside an aggregation over a join.",
)
def q12_shipmode_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "window_rank_extended",
    oracle="""
    SELECT s_suppkey, s_nationkey, s_acctbal,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           NTILE(4) OVER w AS quartile,
           FIRST_VALUE(s_suppkey) OVER w AS first_in_nation,
           NTH_VALUE(s_suppkey, 2) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey ASC
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_in_nation
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey ASC)
    """,
    tags=("window",),
    doc="Extended window functions: percent_rank/cume_dist/ntile/first_value/nth_value with deterministic ordering.",
)
def window_rank_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey").asc())
    wf = w.rowsBetween(Window.unboundedPreceding, 0)
    return _t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
        F.first("s_suppkey").over(w).alias("first_in_nation"),
        F.nth_value("s_suppkey", 2).over(wf).alias("second_in_nation"),
    )


@register(
    "agg_listagg",
    oracle="""
    SELECT c_nationkey,
           array_to_string(list_sort(list(c_name)), '|') AS names_sorted,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), '|') AS segments
    FROM customer
    WHERE c_custkey < 200
    GROUP BY c_nationkey
    """,
    tags=("agg", "collect"),
    doc=(
        "Collect-list aggregation made deterministic: collect_list order "
        "is partitioning-dependent, so results are sorted before exposure "
        "— the only safe way to emit collections at any parallelism. Both "
        "collections are string-joined because the driver's value hash "
        "cannot hash top-level array columns (CORRECTNESS_r01 agg_listagg)."
    ),
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_list("c_name")), "|").alias("names_sorted"),
        F.array_join(F.array_sort(F.collect_set("c_mktsegment")), "|").alias("segments"),
    )


@register(
    "agg_boolean",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_totalprice > 500000) AS any_huge
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg", "boolean"),
    doc="Boolean aggregates: count_if / every / any (bool_and / bool_or).",
)
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.every(F.col("o_totalprice") > 0).alias("all_positive"),
        F.some(F.col("o_totalprice") > 500000).alias("any_huge"),
    )


@register(
    "unpivot_melt",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
    """,
    tags=("reshape",),
    doc="Unpivot/melt (wide→long reshape): DataFrame.unpivot ≙ UNION ALL of per-column projections.",
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_size").cast("double").alias("p_size"), "p_retailprice"
    )
    return p.unpivot("p_partkey", ["p_size", "p_retailprice"], "metric", "value")


@register(
    "q7_nation_volume",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_name < cn.n_name
    GROUP BY sn.n_name, cn.n_name
    """,
    tags=("join", "agg"),
    doc="TPC-H Q7-style nation-pair trade volume: the same dim table joined twice under different roles.",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(dsum(revenue, 6).alias("revenue"))
    )


@register(
    "q13_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
    tags=("join", "agg"),
    doc="TPC-H Q13-style: distribution of per-customer order counts (double aggregation over a left join; COUNT(col) skips nulls).",
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "window_range_frame",
    oracle="""
    SELECT s_suppkey, s_nationkey, s_acctbal,
           COUNT(*) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal
                          RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_within_1000,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) OVER (
                PARTITION BY s_nationkey ORDER BY s_acctbal
                RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS bal_below_sum
    FROM supplier
    """,
    tags=("window", "range-frame"),
    doc=(
        "RANGE window frames (value-based, not row-based): peers within "
        "±1000 balance. Frame membership depends only on values, so the "
        "exact-decimal sum stays engine- and order-independent."
    ),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    w1 = Window.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").asc()).rangeBetween(-1000, 1000)
    w2 = Window.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").asc()).rangeBetween(-1000, 0)
    return _t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.count(F.lit(1)).over(w1).alias("n_within_1000"),
        F.sum(F.col("s_acctbal").cast("decimal(18,2)")).over(w2).cast("double").alias("bal_below_sum"),
    )


@register(
    "events_funnel",
    oracle="""
    WITH signups AS (
      SELECT user_id, MIN(ts) AS first_signup FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    conversions AS (
      SELECT s.user_id, MIN(e.ts) AS first_purchase
      FROM signups s JOIN events e
        ON e.user_id = s.user_id AND e.event_type = 'purchase' AND e.ts > s.first_signup
      GROUP BY s.user_id
    )
    SELECT s.user_id, s.first_signup, c.first_purchase,
           (c.first_purchase IS NOT NULL) AS converted
    FROM signups s LEFT JOIN conversions c ON c.user_id = s.user_id
    """,
    tags=("funnel", "events"),
    doc="Event funnel: per-user signup → first subsequent purchase (conversion analysis over the events stream table).",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    signups = (
        e.filter(F.col("event_type") == "signup").groupBy("user_id").agg(F.min("ts").alias("first_signup"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conversions = (
        signups.join(purchases, (F.col("p_user") == F.col("user_id")) & (F.col("p_ts") > F.col("first_signup")))
        .groupBy("user_id")
        .agg(F.min("p_ts").alias("first_purchase"))
        .withColumnRenamed("user_id", "c_user")
    )
    return (
        signups.join(conversions, signups.user_id == F.col("c_user"), "left")
        .select(
            "user_id",
            "first_signup",
            "first_purchase",
            F.col("first_purchase").isNotNull().alias("converted"),
        )
    )


@register(
    "q14_promo_share",
    oracle="""
    SELECT CAST(YEAR(l_shipdate) AS INT) AS ship_year,
           CAST(CAST(SUM(CAST(CASE WHEN p_type IN ('A', 'B') THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    """,
    tags=("join", "agg", "conditional"),
    doc="TPC-H Q14-style promo revenue share: ratio of two conditional exact-decimal sums per year.",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type").isin("A", "B"), rev).otherwise(F.lit(0.0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg((dsum(promo_rev, 6) / dsum(rev, 6)).alias("promo_share"))
    )


@register(
    "q17_small_quantity",
    oracle=f"""
    WITH avg_qty AS (
      SELECT l_partkey AS ap_key, {sql_davg('l_quantity', 2)} AS avg_q
      FROM lineitem GROUP BY l_partkey
    )
    SELECT {sql_dsum('l_extendedprice', 2)} AS total_price, COUNT(*) AS n_lines
    FROM lineitem JOIN avg_qty ON l_partkey = ap_key
    WHERE l_quantity < 0.5 * avg_q
    """,
    tags=("join", "agg", "subquery"),
    doc=(
        "TPC-H Q17-style: lines below half their part's average quantity "
        "— a correlated aggregate decorrelated into a self-join (exact "
        "mean so the < comparison is engine-identical)."
    ),
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(davg("l_quantity", 2).alias("avg_q"))
    return (
        li.join(avg_qty, li.l_partkey == avg_qty.ap_key)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_q"))
        .agg(dsum("l_extendedprice", 2).alias("total_price"), F.count(F.lit(1)).alias("n_lines"))
    )


@register(
    "q19_disjunctive",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
    """,
    tags=("join", "filter"),
    doc="TPC-H Q19-style disjunctive multi-branch predicate across both join sides.",
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & q.between(20, 40))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dsum(rev, 6).alias("revenue"))
    )


@register(
    "agg_grouping_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
    doc=(
        "GROUPING() flags + composed grouping id over a ROLLUP: the only "
        "reliable way to tell a subtotal row's NULL dimension from a data "
        "NULL — every BI layer on top of the engine depends on it."
    ),
)
def agg_grouping_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            (F.grouping("l_returnflag").cast("int") * 2 + F.grouping("l_linestatus").cast("int")).alias("gid"),
            F.count(F.lit(1)).alias("n"),
        )
    )
