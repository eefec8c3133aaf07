"""Round-7 scale-wart retirement (VERDICT r6 next-steps 2-3).

``events_activity_gini`` and ``orders_rfm_segments`` were the last two
operators ranking a full dimension in one window partition. Gini now
runs on the two-phase histogram rank (arithmetic-series rank blocks);
RFM on a distributed exact ROW_NUMBER (range-repartition + broadcast
offsets) fed through integer NTILE math. These tests pin (a) the
equivalence of the distributed primitives to the single-sort ones and
(b) the plan shape — no per-row rank, no unpartitioned window over
more-than-histogram input.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from argodb_mapreduce_spark.functions.rank_stats import global_row_number, ntile_from_rank
from argodb_mapreduce_spark.operators.analytics import events_activity_gini
from argodb_mapreduce_spark.plans.checks import explain_str


def _toy(spark, n=5000, seed=7):
    # deterministic keys with heavy ties on "v" and a unique tie-break "k"
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.hash(F.col("id") + seed) % 17).alias("v"),
        (F.hash(F.col("id") * 31 + seed) % 1000000).alias("m"),
    )


def test_global_row_number_matches_single_sort(spark):
    df = _toy(spark)
    got = global_row_number(df, [F.col("v").desc(), F.col("k").asc()], "rn")
    w = Window.orderBy(F.col("v").desc(), F.col("k").asc())
    want = df.withColumn("rn", F.row_number().over(w).cast("bigint"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_global_row_number_empty_input(spark):
    df = _toy(spark).filter(F.lit(False))
    got = global_row_number(df, [F.col("v").asc(), F.col("k").asc()], "rn")
    assert got.count() == 0
    assert "rn" in got.columns


@pytest.mark.parametrize("n,k", [(1, 5), (3, 5), (5, 5), (7, 5), (100, 5), (101, 7), (4, 9)])
def test_ntile_from_rank_matches_sql_ntile(spark, n, k):
    # n < k exercises the every-row-its-own-bucket branch (q == 0)
    df = spark.range(1, n + 1).select(F.col("id").alias("k"))
    w = Window.orderBy("k")
    want = df.select("k", F.ntile(k).over(w).cast("int").alias("bin"))
    got = df.select(
        "k",
        ntile_from_rank(F.col("k").cast("bigint"), F.lit(n).cast("bigint"), k).alias("bin"),
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_global_running_sum_matches_single_sort(spark):
    from argodb_mapreduce_spark.functions.rank_stats import global_running_sum

    df = _toy(spark).withColumn("val", (F.col("m") % 997).cast("decimal(18,6)"))
    got = global_running_sum(
        df, [F.col("v").desc(), F.col("k").asc()], F.col("val"), "cum", "total"
    ).select("k", F.col("cum").cast("decimal(28,6)").alias("cum"),
             F.col("total").cast("decimal(28,6)").alias("total"))
    w = (
        Window.orderBy(F.col("v").desc(), F.col("k").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.select(
        "k",
        F.sum("val").over(w).cast("decimal(28,6)").alias("cum"),
        F.sum("val").over(Window.partitionBy()).cast("decimal(28,6)").alias("total"),
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_abc_has_no_dimension_scale_global_window(spark, sf_dir):
    """The ABC cumulative share must not sort the part dimension in one
    reducer: the only single-partition window may receive the O(P)
    per-partition sum table (scan of the checkpointed range partitions
    appears as ExistingRDD, not a full-dimension Sort under Window)."""
    from argodb_mapreduce_spark.operators.bi import parts_abc_classification

    plan = explain_str(parts_abc_classification(spark, sf_dir), "simple")
    # the local running sum partitions by _pid; no ntile/full-dim rank
    assert "Window [sum" in plan or "Window" in plan
    import re
    # every Sort feeding a SinglePartition exchange must sit above the
    # _pid aggregate (the O(P) offsets table), never the raw dimension
    for m in re.finditer(r"Exchange SinglePartition", plan):
        below = plan[m.start():]
        agg = below.find("HashAggregate(keys=[_pid")
        scan = below.find("FileScan")
        assert agg != -1 and (scan == -1 or agg < scan), (
            f"SinglePartition exchange fed by more than the _pid sums:\n{plan}"
        )


def test_ntile_from_rank_exhaustive_small(spark):
    """Exhaustive (n, k, rn) sweep for n <= 40, k <= n+3 in ONE Spark
    job: the integer NTILE formula must match the SQL definition
    (first n%k buckets get n//k+1 rows) at every rank."""
    rows = []
    for n in range(1, 41):
        for k in list(range(1, min(n, 9) + 1)) + [n + 3]:
            q, r = divmod(n, k)
            sizes = [q + 1] * r + [q] * (k - r)
            want, b = [], 1
            for size in sizes:
                want.extend([b] * size)
                b += 1
            for rn in range(1, n + 1):
                rows.append((n, k, rn, want[rn - 1]))
    df = spark.createDataFrame(rows, "n long, k int, rn long, want int")
    # ntile_from_rank takes a literal k; group rows by k and vectorize
    ks = sorted({k for _, k, _, _ in rows})
    bad = 0
    for k in ks:
        sub = df.filter(F.col("k") == k).select(
            "n", "rn", "want",
            ntile_from_rank(F.col("rn"), F.col("n"), k).alias("got"),
        )
        bad += sub.filter(F.col("got") != F.col("want")).count()
    assert bad == 0


def test_gini_window_input_is_histogram_only(spark, sf_dir):
    """No per-row rank: the only Window runs over the per-n_events
    histogram (output of a HashAggregate keyed on n_events), never the
    user dimension."""
    plan = explain_str(events_activity_gini(spark, sf_dir), "simple")
    assert "row_number" not in plan.lower(), "per-row ranks are back"
    # rank_histogram emits two windows (cum + n), both over the histogram
    assert plan.count("Window") == 2, plan
    # everything below the deepest Window must be the n_events histogram
    below = plan[plan.rindex("Window"):]
    assert "HashAggregate(keys=[n_events" in below, (
        f"Window must sit on the n_events histogram:\n{plan}"
    )


def test_rfm_has_no_single_partition_ntile(spark, sf_dir):
    from argodb_mapreduce_spark.operators.bi import orders_rfm_segments

    plan = explain_str(orders_rfm_segments(spark, sf_dir), "simple")
    assert "ntile" not in plan.lower(), "single-sort NTILE windows are back"
