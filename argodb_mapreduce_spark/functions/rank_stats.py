"""Two-phase exact rank statistics over fact-scale input.

The naive exact median/percentile ranks every ROW with a window — at
100 TB a per-group (or worse, global) total order over billions of
rows lands in a handful of giant window partitions. When the measure
lives on a bounded grid (2-decimal prices/values, integer day gaps),
the scale-safe exact shape is TWO-PHASE:

1. reduce the fact table to a per-(group, value) histogram — one
   map-side-combinable groupBy whose output is O(|grid|), not O(rows);
2. run the cumulative-count window over the tiny histogram only, and
   select the value at rank r as MIN(value WHERE cum_count >= r).

Selection by rank over sorted values is tie-agnostic, so the result is
bit-identical to a ROW_NUMBER selection with any tie-break. Expressing
the selection as MIN(CASE...) aggregates (instead of a filter + join)
also keeps the 1-row-per-group summary alive on empty input — the
degenerate case where a filter/crossJoin pipeline silently returns 0
rows while a SQL aggregate oracle returns NULLs.

Used by ``orders_interarrival_stats`` (operators/bi.py),
``events_anomaly_mad`` / ``clean_winsorize`` (operators/cleaning.py)
and ``agg_median_manual`` (functions/stats.py). The histogram shape
also powers ``events_activity_gini`` (rank-weighted sums from
arithmetic-series tie blocks). When the measure is NOT on a bounded
grid (near-unique values), the histogram degenerates to the dimension
— that regime uses the distributed primitives below instead:
``global_row_number`` / ``global_running_sum`` (range-repartition +
broadcast partition offsets; ``orders_rfm_segments``,
``parts_abc_classification``) and ``ntile_from_rank``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rank_histogram(df: DataFrame, group: str | None, value: str) -> DataFrame:
    """Per-(group, value) counts with cumulative rank.

    Returns columns ``[group,] value, cnt, cum, n`` where ``cum`` is the
    count of rows with value <= this value within the group and ``n``
    the group total. The windows run over the HISTOGRAM (distinct
    values), never the fact rows; ``group=None`` builds one global
    histogram (the window partition is the whole — already bounded —
    histogram).
    """
    keys = ([group] if group is not None else []) + [value]
    hist = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    part = [group] if group is not None else []
    wcum = (
        Window.partitionBy(*part)
        .orderBy(value)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*part)
    return hist.select(
        *keys,
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )


def value_at_rank(value: str, rank: Column) -> Column:
    """Aggregate over a rank_histogram frame: the value whose cumulative
    count first reaches ``rank`` — i.e. the element at 1-based position
    ``rank`` of the sorted multiset. NULL when the group is empty or the
    rank exceeds n."""
    return F.min(F.when(F.col("cum") >= rank, F.col(value)))


def median_rank_lo(n: Column) -> Column:
    """Rank of the lower middle element: (n + 1) // 2."""
    return F.floor((n + 1) / 2)


def median_rank_hi(n: Column) -> Column:
    """Rank of the upper middle element: (n + 2) // 2."""
    return F.floor((n + 2) / 2)


def global_row_number(
    df: DataFrame, order_cols: list[Column], rn_name: str = "rn"
) -> DataFrame:
    """Exact global ROW_NUMBER over a unique total order WITHOUT a
    single-partition sort.

    The naive ``Window.orderBy(...)`` funnels every row through one
    reducer. The scale-safe exact shape: range-repartition on the order
    (each partition holds one contiguous key range, sorted locally),
    freeze partition ids with a localCheckpoint (so the two consumers
    below cannot see different AQE-coalesced pid mappings), count rows
    per partition, turn the O(P)-row count table into cumulative
    offsets with an O(P) window, broadcast-join it back, and add the
    per-partition local row_number to the partition's offset. Ranks
    are identical to the single-sort ROW_NUMBER for any partition
    boundaries because the total order is unique; max partition work is
    n/P rows instead of n.

    ``order_cols`` must be a unique total order (tie-break on a key)
    and is used for BOTH the range partitioner and the local sort.
    """
    parts = df.repartitionByRange(*order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    parts = parts.localCheckpoint(eager=False)
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        parts.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .select("_pid", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"))
    )
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        parts.join(F.broadcast(offsets), "_pid")
        .withColumn(rn_name, (F.row_number().over(w_local) + F.col("_off")).cast("bigint"))
        .drop("_pid", "_off")
    )


def global_running_sum(
    df: DataFrame,
    order_cols: list[Column],
    value: Column,
    cum_name: str = "cum",
    total_name: str = "total",
) -> DataFrame:
    """Exact distributed cumulative sum over a unique total order —
    the two-pass range-partitioned prefix sum.

    Same shape as :func:`global_row_number`: range-repartition on the
    order (pids frozen by a localCheckpoint), per-partition SUMs form
    an O(P) table whose prefix sums become broadcast offsets, and each
    row's global running sum is its partition-local running sum plus
    the partition's offset. ``value`` must be an exact type (decimal /
    integer) so partial-sum association equals the single-sort
    cumulative bit-for-bit. Adds ``cum_name`` (running sum including
    the current row) and ``total_name`` (grand total) columns; the
    only unpartitioned window runs over the O(P) partition-sum table.
    """
    parts = (
        df.repartitionByRange(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_v", value)
        .localCheckpoint(eager=False)
    )
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy()
    offs = (
        parts.groupBy("_pid")
        .agg(F.sum("_v").alias("_psum"))
        .select(
            "_pid",
            F.coalesce(F.sum("_psum").over(w_off), F.lit(0)).alias("_off"),
            F.sum("_psum").over(w_all).alias(total_name),
        )
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        parts.join(F.broadcast(offs), "_pid")
        .withColumn(cum_name, F.sum("_v").over(w_local) + F.col("_off"))
        .drop("_pid", "_off", "_v")
    )


def ntile_from_rank(rn: Column, n: Column, k: int) -> Column:
    """Exact NTILE(k) bucket from a 1-based global rank and total count.

    SQL NTILE(k) over n rows: the first ``n % k`` buckets get
    ``n div k + 1`` rows, the rest ``n div k``. Pure integer
    arithmetic — composes with :func:`global_row_number` to give the
    distributed NTILE that Spark's single-partition
    ``ntile().over(Window.orderBy(...))`` cannot.
    """
    def idiv(a: Column, b: Column) -> Column:
        # floor(a/b) in exact integer arithmetic: a%b is exact on longs
        # and (a - a%b)/b divides evenly, so the double division is a
        # representable integer (quotient < 2^53) — no float rounding.
        return ((a - a % b) / b).cast("bigint")

    q = idiv(n.cast("bigint"), F.lit(k))
    r = (n.cast("bigint") % k).cast("bigint")
    big = r * (q + 1)  # rows 1..big live in the r wide buckets
    return (
        F.when(rn <= big, idiv(rn - 1, q + 1) + 1)
        .otherwise(r + idiv(rn - big - 1, F.greatest(q, F.lit(1))) + 1)
        .cast("int")
    )


def median_exact(value: str, scale: int = 2) -> Column:
    """Aggregate over a rank_histogram frame: exact median as the
    decimal-grid average of the two middle elements (equal for odd n —
    (2v)/2 is exact in double, so the odd case collapses to v). Matches
    the SQL oracle's SUM(DECIMAL)/COUNT over ``rn IN (lo, hi)``."""
    lo = value_at_rank(value, median_rank_lo(F.col("n"))).cast(f"decimal(18,{scale})")
    hi = value_at_rank(value, median_rank_hi(F.col("n"))).cast(f"decimal(18,{scale})")
    return (lo + hi).cast("double") / 2
