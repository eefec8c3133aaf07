"""BI composite shapes (SURVEY.md §2.B3/B5 extensions): statistical
mode, percent-of-total windows, and RFM quintile segmentation — the
everyday reporting keyings a reference user would otherwise hand-roll
as MapReduce reducers.

All three are single-pass window/groupBy algebra with deterministic
tie-breaks, so each has an exact DuckDB twin:

- ``agg_mode`` — most frequent value per group, ties broken by value
  order (SQL has no portable MODE() with deterministic ties; the
  row_number-over-counts formulation is the engine-exact version).
- ``window_percent_of_total`` — each row's share of its group total;
  the group total is an exact decimal window sum so the denominator is
  identical at any parallelism.
- ``orders_rfm_segments`` — classic Recency/Frequency/Monetary quintile
  segmentation of customers via NTILE(5) with unique-key tie-breaks.

Scale: mode shuffles on (group, value) then (group) — both combiner-
reduced; percent-of-total is one window shuffle on the group key; RFM
is one customer aggregation plus three DISTRIBUTED exact ranks
(range-repartition + broadcast offset table per metric,
functions/rank_stats.global_row_number) — a global quintile needs a
total order, but not a single-partition one: each executor sorts only
its n/P-row key range and the exact NTILE bucket falls out of integer
arithmetic on (rank, n)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from argodb_mapreduce_spark.catalog import load_table
from argodb_mapreduce_spark.functions.oracle_safe import dsum, sql_dsum
from argodb_mapreduce_spark.functions.rank_stats import (
    global_row_number,
    global_running_sum,
    ntile_from_rank,
)
from argodb_mapreduce_spark.registry import register


@register(
    "agg_mode",
    oracle="""
    WITH counts AS (
      SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus AS mode_linestatus, n AS mode_count FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY l_returnflag ORDER BY n DESC, l_linestatus ASC) AS rn
      FROM counts
    ) WHERE rn = 1
    """,
    tags=("agg", "stats"),
    doc=(
        "Statistical mode with deterministic ties: count per (group, "
        "value), keep the top count per group with value-order "
        "tie-break. Two combiner-reduced shuffles; the per-group state "
        "is one row — the exact, portable MODE()."
    ),
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("l_returnflag").orderBy(F.col("n").desc(), F.col("l_linestatus").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_linestatus").alias("mode_linestatus"), F.col("n").alias("mode_count"))
    )


@register(
    "window_percent_of_total",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_extendedprice AS DOUBLE) /
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                       OVER (PARTITION BY l_orderkey) AS VARCHAR) AS DOUBLE) AS line_share
    FROM lineitem
    """,
    tags=("window", "ratio"),
    doc=(
        "Percent-of-total window: each line's share of its order's "
        "revenue. The denominator is an exact decimal window sum cast "
        "to double through the engine-exact VARCHAR hop, so the share "
        "is bit-identical at any parallelism — the BI shape behind "
        "contribution and mix reports. One shuffle on the group key."
    ),
)
def window_percent_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    total = F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).over(w).cast("double")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice").cast("double") / total).alias("line_share"),
    )


#: RFM quintile count.
RFM_BINS = 5


@register(
    "orders_rfm_segments",
    oracle=f"""
    WITH rfm AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             {sql_dsum("o_totalprice", 2)} AS monetary
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
           CAST(NTILE({RFM_BINS}) OVER (ORDER BY last_order DESC, o_custkey ASC) AS INT) AS r_bin,
           CAST(NTILE({RFM_BINS}) OVER (ORDER BY frequency DESC, o_custkey ASC) AS INT) AS f_bin,
           CAST(NTILE({RFM_BINS}) OVER (ORDER BY monetary DESC, o_custkey ASC) AS INT) AS m_bin,
           frequency, monetary
    FROM rfm
    """,
    tags=("window", "segmentation"),
    doc=(
        f"RFM segmentation: per-customer recency/frequency/monetary "
        f"rolled up from orders, then NTILE({RFM_BINS}) quintiles per "
        "metric with unique-key tie-breaks (1 = best). Each quintile "
        "is computed as a DISTRIBUTED exact rank (range-repartition + "
        "broadcast per-partition offsets, rank_stats.global_row_number) "
        "fed through the exact integer NTILE formula — bit-identical "
        "to the oracle's NTILE windows with no single-reducer sort "
        "anywhere (VERDICT r6 next-step 3)."
    ),
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three global quintiles over the customer dimension, distributed.

    Scale design: the fact table reduces to one row per customer first;
    each metric then gets an exact global ROW_NUMBER via
    ``global_row_number`` (range shuffle, per-partition local sort of
    n/P rows, O(P) offset table broadcast back — never a
    single-partition window; the histogram shortcut doesn't apply
    because the monetary metric is near-unique, so its "histogram" IS
    the dimension). NTILE buckets derive from (rank, n) with exact
    integer arithmetic (``ntile_from_rank``), matching SQL NTILE's
    wide-buckets-first split. n arrives as a broadcast 1-row aggregate.
    """
    o = load_table(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        dsum("o_totalprice", 2).alias("monetary"),
    )
    ranked = global_row_number(
        rfm, [F.col("last_order").desc(), F.col("o_custkey").asc()], "rn_r"
    )
    ranked = global_row_number(
        ranked, [F.col("frequency").desc(), F.col("o_custkey").asc()], "rn_f"
    )
    ranked = global_row_number(
        ranked, [F.col("monetary").desc(), F.col("o_custkey").asc()], "rn_m"
    )
    n_row = rfm.agg(F.count(F.lit(1)).alias("_n"))
    n = F.col("_n")
    return ranked.crossJoin(F.broadcast(n_row)).select(
        "o_custkey",
        ntile_from_rank(F.col("rn_r"), n, RFM_BINS).alias("r_bin"),
        ntile_from_rank(F.col("rn_f"), n, RFM_BINS).alias("f_bin"),
        ntile_from_rank(F.col("rn_m"), n, RFM_BINS).alias("m_bin"),
        "frequency",
        "monetary",
    )


@register(
    "basket_pair_lift",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), n_baskets AS (
      SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n FROM items
    ), item_n AS (
      SELECT item, CAST(COUNT(*) AS BIGINT) AS n_item FROM items GROUP BY item
    ), pair_n AS (
      SELECT a.item AS item_a, b.item AS item_b, CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM items a JOIN items b ON a.basket = b.basket AND a.item < b.item
      GROUP BY a.item, b.item
    )
    SELECT p.item_a, p.item_b, p.n_ab,
           CAST(nb.n * p.n_ab AS DOUBLE)
             / CAST(ia.n_item * ib.n_item AS DOUBLE) AS lift
    FROM pair_n p
    JOIN item_n ia ON ia.item = p.item_a
    JOIN item_n ib ON ib.item = p.item_b
    CROSS JOIN n_baskets nb
    """,
    tags=("bi", "join", "association"),
    doc=(
        "Market-basket association mining: per-order distinct brand "
        "sets, pair supports via an orderkey self-join (quadratic only "
        "within one basket, whose width is bounded by order size), and "
        "lift = N*n_ab / (n_a*n_b) as one exact-integer-operand IEEE "
        "division. The support/lift table every BI layer derives "
        "recommendations from."
    ),
)
def basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand co-purchase lift over order baskets.

    Scale design: the part dim join is broadcast; distinct (basket,
    item) is one map-combinable aggregate; the pair self-join shuffles
    on basket, where per-basket fan-out is order-size², bounded by the
    TPC-H ~7-lineitem order width (a retail 10⁴-item basket would cap
    per-basket items first, like COOC_MAX_TOKENS_PER_DOC). The
    |items|²-row pair aggregate then joins the |items|-row marginals —
    broadcast-sized at any corpus scale. Lift's operands (n*n_ab,
    n_a*n_b) are exact 64-bit integers well inside double's 2^53, so
    the single division is bit-identical on both engines.
    """
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    items = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item"))
        .distinct()
    )
    n_baskets = items.select(F.countDistinct("basket").alias("n"))
    item_n = items.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    a = items.alias("a")
    b = items.alias("b")
    pair_n = (
        a.join(b, (F.col("a.basket") == F.col("b.basket")) & (F.col("a.item") < F.col("b.item")))
        .groupBy(F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    ia = item_n.select(F.col("item").alias("item_a"), F.col("n_item").alias("n_a"))
    ib = item_n.select(F.col("item").alias("item_b"), F.col("n_item").alias("n_b"))
    return (
        pair_n.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            (
                (F.col("n") * F.col("n_ab")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )


#: Grid bits for the OLS moment sums: per-row centered products reach
#: ~|x-x̄|·|y-ȳ| ≈ 1e3·1e7 = 1e10, and ROUND(v·2^14) must stay inside
#: int64 for the DuckDB twin — 14 bits leaves 5 orders of headroom
#: while quantizing at 6e-5, far below any trend-reading threshold.
OLS_GRID_BITS = 14


def _ols_sql() -> str:
    from argodb_mapreduce_spark.functions.oracle_safe import sql_dsum, sql_gsum

    cov = sql_gsum("(CAST(d.x AS DOUBLE) - s.xbar) * (d.y - s.ybar)", OLS_GRID_BITS)
    var = sql_gsum(
        "(CAST(d.x AS DOUBLE) - s.xbar) * (CAST(d.x AS DOUBLE) - s.xbar)", OLS_GRID_BITS
    )
    return f"""
    WITH daily AS (
      SELECT o_orderpriority,
             date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS x,
             {sql_dsum("o_totalprice")} AS y
      FROM orders GROUP BY 1, 2
    ), stats AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(x) AS DOUBLE) / COUNT(*) AS xbar,
             {sql_dsum("y")} / COUNT(*) AS ybar
      FROM daily GROUP BY 1
    ), fit AS (
      SELECT d.o_orderpriority, ANY_VALUE(s.n_days) AS n_days,
             ANY_VALUE(s.xbar) AS xbar, ANY_VALUE(s.ybar) AS ybar,
             ({cov}) / NULLIF(({var}), 0) AS slope
      FROM daily d JOIN stats s ON s.o_orderpriority = d.o_orderpriority
      GROUP BY d.o_orderpriority
    )
    SELECT o_orderpriority, n_days, slope,
           ybar - slope * xbar AS intercept
    FROM fit
    """


@register(
    "orders_ols_trend",
    oracle=_ols_sql(),
    tags=("bi", "regression", "timeseries"),
    doc=(
        "Closed-form OLS trend of daily revenue per order priority: "
        "slope = Cov(day, revenue) / Var(day) over per-day aggregates, "
        "intercept from the means. The moment sums ride the "
        f"2^-{OLS_GRID_BITS} grid and the means are exact-sum/count "
        "divisions, so the fitted line is bit-identical across engines "
        "and parallelism — regression as a two-aggregate dataflow, no "
        "ML library."
    ),
)
def orders_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority revenue trend line (the forecasting op beside q6).

    Scale design: pass 1 reduces the fact table to (priority, day)
    aggregates — map-combinable, O(priorities x days) output; pass 2
    broadcasts the 5-row means back over that tiny aggregate, so the
    regression costs one fact-table aggregation no matter the corpus
    size. All float steps are deterministic: exact-decimal revenue
    sums, integer day indices, single divisions for the means, and
    grid sums for the centered moments.
    """
    from argodb_mapreduce_spark.functions.oracle_safe import dsum, gsum

    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            "o_orderpriority",
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
            ).alias("x"),
        )
        .agg(dsum("o_totalprice").alias("y"))
    )
    stats = daily.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_days"),
        (F.sum("x").cast("double") / F.count(F.lit(1))).alias("xbar"),
        (dsum("y") / F.count(F.lit(1))).alias("ybar"),
    )
    joined = daily.join(F.broadcast(stats), "o_orderpriority")
    dx = F.col("x").cast("double") - F.col("xbar")
    dy = F.col("y") - F.col("ybar")
    fit = joined.groupBy("o_orderpriority").agg(
        F.any_value("n_days").alias("n_days"),
        F.any_value("xbar").alias("xbar"),
        F.any_value("ybar").alias("ybar"),
        # NULLIF guard: a single-day priority has Var(x)=0 — DuckDB IEEE
        # division would yield inf/NaN while Spark's Divide yields NULL;
        # nulling the zero denominator on BOTH engines keeps exact parity
        # on degenerate input.
        (
            gsum(dx * dy, OLS_GRID_BITS)
            / F.nullif(gsum(dx * dx, OLS_GRID_BITS), F.lit(0.0))
        ).alias("slope"),
    )
    return fit.select(
        "o_orderpriority",
        "n_days",
        "slope",
        (F.col("ybar") - F.col("slope") * F.col("xbar")).alias("intercept"),
    )


#: ABC cutoffs: A = first 80% of cumulative revenue, B = next 15%.
ABC_A = 0.80
ABC_B = 0.95


def _abc_sql() -> str:
    from argodb_mapreduce_spark.functions.oracle_safe import sql_dsum

    return f"""
    WITH part_rev AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS rev_dec
      FROM lineitem GROUP BY l_partkey
    ), ranked AS (
      SELECT l_partkey, rev_dec,
             SUM(rev_dec) OVER (
               ORDER BY rev_dec DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_dec,
             SUM(rev_dec) OVER () AS total_dec
      FROM part_rev
    ), classed AS (
      SELECT l_partkey,
             CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS revenue,
             CASE
               WHEN CAST(CAST(cum_dec AS VARCHAR) AS DOUBLE)
                    / CAST(CAST(total_dec AS VARCHAR) AS DOUBLE) <= {ABC_A!r} THEN 'A'
               WHEN CAST(CAST(cum_dec AS VARCHAR) AS DOUBLE)
                    / CAST(CAST(total_dec AS VARCHAR) AS DOUBLE) <= {ABC_B!r} THEN 'B'
               ELSE 'C'
             END AS abc_class
      FROM ranked
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           {sql_dsum("revenue", 6)} AS class_revenue
    FROM classed GROUP BY abc_class
    """


@register(
    "parts_abc_classification",
    oracle=_abc_sql(),
    tags=("bi", "window", "pareto"),
    doc=(
        f"ABC / Pareto inventory classification: parts ranked by "
        f"revenue, cumulative-share cut at {ABC_A:.0%} (A) and "
        f"{ABC_B:.0%} (B). The running share accumulates EXACT decimals "
        "in a total order (revenue DESC, partkey tie-break) and converts "
        "to double once per row via the correctly-rounded string hop, so "
        "the class boundary falls identically in both engines."
    ),
)
def parts_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto classification of parts by revenue contribution.

    Scale design: the fact table reduces to one row per part
    (map-combinable groupBy); the global cumulative share then runs as
    the two-pass range-partitioned prefix sum
    (``rank_stats.global_running_sum``): each executor accumulates its
    own contiguous (revenue DESC, partkey) range and adds a broadcast
    partition offset — no single-partition window over the part
    dimension at any cardinality (the r6-era plan sorted all |parts|
    in one reducer; this retires that wart the same way as the RFM
    NTILE). The running sum stays exact decimal in a TOTAL order, so
    no float accumulation-order drift exists for the share comparison
    and the class boundary falls identically to the oracle's
    single-sort cumulative.
    """
    l = load_table(spark, sf_dir, "lineitem")
    part_rev = l.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast("decimal(18,6)")
        ).alias("rev_dec")
    )
    ranked = global_running_sum(
        part_rev,
        [F.col("rev_dec").desc(), F.col("l_partkey").asc()],
        F.col("rev_dec"),
        cum_name="cum_dec",
        total_name="total_dec",
    )
    share = F.col("cum_dec").cast("double") / F.col("total_dec").cast("double")
    classed = ranked.select(
        F.col("rev_dec").cast("double").alias("revenue"),
        F.when(share <= ABC_A, "A").when(share <= ABC_B, "B").otherwise("C").alias("abc_class"),
    )
    from argodb_mapreduce_spark.functions.oracle_safe import dsum

    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        dsum("revenue", 6).alias("class_revenue"),
    )


@register(
    "orders_cohort_ltv",
    oracle=f"""
    WITH first_order AS (
      SELECT o_custkey,
             MIN(CAST(date_trunc('month', o_orderdate) AS DATE)) AS cohort_month
      FROM orders GROUP BY o_custkey
    ), aged AS (
      SELECT f.cohort_month,
             (EXTRACT(YEAR FROM o.o_orderdate) * 12 + EXTRACT(MONTH FROM o.o_orderdate))
               - (EXTRACT(YEAR FROM f.cohort_month) * 12 + EXTRACT(MONTH FROM f.cohort_month)) AS age_months,
             o.o_totalprice
      FROM orders o JOIN first_order f ON f.o_custkey = o.o_custkey
    ), cell AS (
      SELECT cohort_month, CAST(age_months AS INT) AS age_months,
             {sql_dsum("o_totalprice")} AS revenue
      FROM aged GROUP BY cohort_month, CAST(age_months AS INT)
    )
    SELECT CAST(cohort_month AS TIMESTAMP) AS cohort_month, age_months, revenue,
           CAST(CAST(SUM(CAST(revenue AS DECIMAL(18,4)))
                       OVER (PARTITION BY cohort_month ORDER BY age_months) AS VARCHAR)
                AS DOUBLE) AS cum_ltv
    FROM cell
    """,
    tags=("bi", "cohort", "revenue"),
    doc=(
        "Cohort lifetime value: customers grouped by first-order month, "
        "revenue summed per (cohort, months-since-first) cell, plus the "
        "running cumulative LTV per cohort. The running sum re-enters "
        "the exact-decimal domain (decimal window sum, cast back to "
        "double) because float window sums associate differently across "
        "engines (DuckDB segment-trees its window aggregates) — exact "
        "decimal addition is associative, so the cumulative is "
        "bit-identical anyway."
    ),
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue LTV triangle — the money twin of events_retention's
    user-count triangle.

    Scale design: per-customer first-order month is one combiner-reduced
    aggregate; the cohort join is keyed on o_custkey (AQE broadcasts if
    the customer dim fits); the (cohort, age) cell aggregate collapses
    the fact table to O(months²) rows, so the cumulative window runs
    over a tiny frame no matter the corpus size. Revenue sums are exact
    decimals end-to-end — including the running sum, which would drift
    between engines if left in double.
    """
    o = load_table(spark, sf_dir, "orders")
    first_order = o.groupBy("o_custkey").agg(
        F.min(F.to_date(F.date_trunc("month", "o_orderdate"))).alias("cohort_month")
    )
    month_idx = lambda col: F.year(col) * 12 + F.month(col)  # noqa: E731
    aged = o.join(first_order, "o_custkey").select(
        "cohort_month",
        (month_idx(F.col("o_orderdate")) - month_idx(F.col("cohort_month")))
        .cast("int")
        .alias("age_months"),
        "o_totalprice",
    )
    cell = aged.groupBy("cohort_month", "age_months").agg(
        dsum("o_totalprice").alias("revenue")
    )
    w = Window.partitionBy("cohort_month").orderBy("age_months")
    return cell.select(
        F.col("cohort_month").cast("timestamp").alias("cohort_month"),
        "age_months",
        "revenue",
        F.sum(F.col("revenue").cast("decimal(18,4)")).over(w).cast("double").alias("cum_ltv"),
    )


@register(
    "orders_open_backlog",
    oracle="""
    WITH closes AS (
      SELECT l_orderkey AS o_orderkey, MAX(CAST(l_shipdate AS DATE)) + 1 AS close_day
      FROM lineitem GROUP BY l_orderkey
    ), deltas AS (
      SELECT CAST(o_orderdate AS DATE) AS day, CAST(1 AS BIGINT) AS delta FROM orders
      UNION ALL
      SELECT c.close_day AS day, CAST(-1 AS BIGINT) AS delta
      FROM orders o JOIN closes c ON c.o_orderkey = o.o_orderkey
    ), daily AS (
      SELECT day, CAST(SUM(delta) AS BIGINT) AS net FROM deltas GROUP BY day
    )
    SELECT CAST(day AS TIMESTAMP) AS day, net,
           CAST(SUM(net) OVER (ORDER BY day) AS BIGINT) AS n_open
    FROM daily
    """,
    tags=("bi", "timeseries", "interval"),
    doc=(
        "Open-order backlog over time via the difference-array pattern: "
        "+1 at order date, -1 the day after the last line ships, then a "
        "running integer sum — interval stabbing as O(orders) deltas "
        "instead of a day x open-interval join. Sparse output (only "
        "days where the backlog changes); compose with events_gapfill "
        "to densify. Orders with no line items never close and remain "
        "in the final backlog — the behavior a fulfillment dashboard "
        "wants surfaced, not hidden."
    ),
)
def orders_open_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many orders are open (placed, not fully shipped) each day.

    Scale design: the day x interval join a naive version runs is
    O(days x open orders) — quadratic-ish at 100 TB. The difference
    array is two combiner-reduced aggregates (per-order close day, then
    per-day net delta) and one running sum over the O(days) series;
    every value is an exact integer so the window order can't drift the
    cumulative between engines.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    closes = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.date_add(F.max(F.to_date("l_shipdate")), 1).alias("close_day")
    )
    opens = o.select(F.to_date("o_orderdate").alias("day"), F.lit(1).cast("bigint").alias("delta"))
    closed = (
        o.join(closes, "o_orderkey")
        .select(F.col("close_day").alias("day"), F.lit(-1).cast("bigint").alias("delta"))
    )
    daily = opens.unionAll(closed).groupBy("day").agg(F.sum("delta").alias("net"))
    from pyspark.sql import Window as W

    return daily.select(
        F.col("day").cast("timestamp").alias("day"),
        "net",
        F.sum("net").over(W.orderBy("day")).cast("long").alias("n_open"),
    )


@register(
    "orders_seasonality_dow",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             {sql_dsum("o_totalprice")} AS revenue
      FROM orders GROUP BY 1
    ), dow AS (
      SELECT CAST(EXTRACT(ISODOW FROM day) AS INT) AS day_of_week,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             {sql_dsum("revenue")} AS dow_revenue
      FROM daily GROUP BY 1
    ), total AS (
      SELECT {sql_dsum("revenue")} AS all_revenue,
             CAST(COUNT(*) AS BIGINT) AS all_days
      FROM daily
    )
    SELECT d.day_of_week, d.n_days,
           d.dow_revenue / d.n_days AS avg_daily_revenue,
           (d.dow_revenue / d.n_days) / (t.all_revenue / t.all_days) AS seasonal_index
    FROM dow d, total t
    """,
    tags=("bi", "timeseries", "seasonality"),
    doc=(
        "Day-of-week seasonal index: average daily revenue per ISO "
        "weekday over the overall daily average — index > 1 marks "
        "above-trend weekdays. Revenue rides exact decimals end-to-end; "
        "the two averages and their ratio are fixed-association IEEE "
        "ops, so the index is engine-exact (the multiplicative "
        "seasonality read beside the ACF's autocorrelation view)."
    ),
)
def orders_seasonality_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality profile of order revenue.

    Scale design: the fact table reduces to O(days) exact-decimal
    daily sums (map-combinable); the 7-row weekday aggregate and 1-row
    total broadcast; everything after the first aggregate is constant
    work regardless of corpus size.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        dsum("o_totalprice").alias("revenue")
    )
    dow = daily.groupBy(
        F.dayofweek(F.col("day")).alias("dow_sun1")
    ).agg(
        F.count(F.lit(1)).alias("n_days"),
        dsum("revenue").alias("dow_revenue"),
    ).select(
        # Spark's dayofweek is Sunday=1; convert to ISO (Monday=1).
        F.when(F.col("dow_sun1") == 1, F.lit(7)).otherwise(F.col("dow_sun1") - 1)
        .cast("int")
        .alias("day_of_week"),
        "n_days",
        "dow_revenue",
    )
    total = daily.agg(
        dsum("revenue").alias("all_revenue"), F.count(F.lit(1)).alias("all_days")
    )
    avg_daily = F.col("dow_revenue") / F.col("n_days")
    return dow.crossJoin(F.broadcast(total)).select(
        "day_of_week",
        "n_days",
        avg_daily.alias("avg_daily_revenue"),
        (avg_daily / (F.col("all_revenue") / F.col("all_days"))).alias("seasonal_index"),
    )


@register(
    "orders_interarrival_stats",
    oracle="""
    WITH gaps AS (
      SELECT date_diff('day',
               LAG(CAST(o_orderdate AS DATE)) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               CAST(o_orderdate AS DATE)) AS gap
      FROM orders
    ), g AS (
      SELECT CAST(gap AS BIGINT) AS gap FROM gaps WHERE gap IS NOT NULL
    ), ranked AS (
      SELECT gap, ROW_NUMBER() OVER (ORDER BY gap) AS rn, COUNT(*) OVER () AS n
      FROM g
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(SUM(gap) AS DOUBLE) / COUNT(*) AS mean_gap_days,
           (SELECT CAST(gap AS DOUBLE) FROM ranked WHERE rn = (n + 1) // 2) AS median_gap_days,
           (SELECT CAST(gap AS DOUBLE) FROM ranked WHERE rn = (9 * n + 9) // 10) AS p90_gap_days
    FROM g
    """,
    tags=("bi", "timeseries", "statistics"),
    doc=(
        "Purchase-cadence profile: per-customer inter-order gaps (LAG "
        "over the customer window, integer days), then global count / "
        "mean / lower-median / p90 via a two-phase histogram rank "
        "(gap-value counts first, cumulative rank over the tiny "
        "histogram). Integer gaps make the mean an exact sum/count and "
        "the rank positions integer arithmetic, so every statistic is "
        "engine-exact; empty gap sets yield the same 1-row NULL summary "
        "as the oracle's global aggregate."
    ),
)
def orders_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How often customers reorder — the cadence input to forecasting
    and churn models.

    Scale design: the gap computation is one customer-keyed window
    shuffle; the exact median/p90 then runs TWO-PHASE — the fact-scale
    gap stream reduces to a per-value histogram first (integer day
    gaps: at most date-range-many distinct values, map-side
    combinable), and only the tiny histogram sees a total order (the
    cumulative-count window). No unpartitioned window ever receives
    fact-scale input; at 100 TB the histogram is still a few thousand
    rows. The value at rank r is the smallest gap whose cumulative
    count reaches r — computed as MIN(CASE...) aggregates, so an empty
    gap set still yields the 1-row (n_gaps=0, NULL stats) summary that
    the oracle's global aggregate produces (the old crossJoin against
    empty scalar frames returned 0 rows and diverged).
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.select(
            F.datediff(
                F.to_date("o_orderdate"), F.lag(F.to_date("o_orderdate")).over(w)
            ).cast("long").alias("gap")
        )
        .filter(F.col("gap").isNotNull())
    )
    hist = gaps.groupBy("gap").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = Window.orderBy("gap").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h = hist.select(
        "gap",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    med_rank = F.floor((F.col("n") + 1) / 2)
    p90_rank = F.floor((9 * F.col("n") + 9) / 10)
    return h.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n_gaps"),
        (F.sum(F.col("gap") * F.col("cnt")).cast("double") / F.sum("cnt")).alias("mean_gap_days"),
        F.min(F.when(F.col("cum") >= med_rank, F.col("gap"))).cast("double").alias("median_gap_days"),
        F.min(F.when(F.col("cum") >= p90_rank, F.col("gap"))).cast("double").alias("p90_gap_days"),
    )
