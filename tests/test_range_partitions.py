"""Range-partition layout: reference error fidelity + pruning plan.

The reference raises three distinct errors for the ``"col=value"``
filter depending on the partition layout
(ArgodbMapreduceInputFormat.java:231-238); ``catalog.scan`` must
reproduce each. ``range_scan`` must prune range sections at the
directory level (PartitionFilters in the scan node), which is the whole
point of the layout at 100 TB.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from argodb_mapreduce_spark.catalog import RANGE_PARTITION_MARKER, ScanError, load_table, scan, table_path
from argodb_mapreduce_spark.sources.range_partitions import (
    ORDERS_PRICE_BOUNDS,
    _orders_range_path,
    range_scan,
    write_range_partitioned,
)


def test_filter_on_nonpartition_table_raises(spark, sf_dir):
    with pytest.raises(ScanError, match="not a partition table"):
        scan(spark, table_path(sf_dir, "orders"), filter="o_orderstatus=F")


def test_filter_on_range_partition_raises(spark, sf_dir):
    out = _orders_range_path(spark, sf_dir)
    with pytest.raises(ScanError, match="range-partition"):
        scan(spark, out, filter="o_totalprice=100000")


def test_filter_on_multicolumn_partition_raises(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_two_level")
    (
        load_table(spark, sf_dir, "orders")
        .withColumn("yr", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("yr", "o_orderstatus")
        .parquet(out)
    )
    with pytest.raises(ScanError, match="multi-columns"):
        scan(spark, out, filter="yr=1995")


def test_range_scan_unfiltered_reads_everything(spark, sf_dir):
    out = _orders_range_path(spark, sf_dir)
    # No filter → scan() succeeds (range tables are scannable, just not
    # "col=value"-filterable — reference lines 219-226 list all sections).
    assert scan(spark, out).count() == load_table(spark, sf_dir, "orders").count()


def test_range_scan_values_match_plain_filter(spark, sf_dir):
    out = _orders_range_path(spark, sf_dir)
    got = sorted(
        r["o_orderkey"]
        for r in range_scan(spark, out, lo=150000.0, hi=250000.0).select("o_orderkey").collect()
    )
    expected = sorted(
        r["o_orderkey"]
        for r in load_table(spark, sf_dir, "orders")
        .filter((F.col("o_totalprice") >= 150000) & (F.col("o_totalprice") < 250000))
        .select("o_orderkey")
        .collect()
    )
    assert got == expected and len(got) > 0


def test_range_scan_prunes_directories(spark, sf_dir):
    out = _orders_range_path(spark, sf_dir)
    plan = range_scan(spark, out, lo=150000.0, hi=250000.0)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "range_id" in plan
    # Point lookup inside one bucket → exactly one section listed.
    one = range_scan(spark, out, lo=250000.0, hi=260000.0)
    assert [r["range_id"] for r in one.select("range_id").distinct().collect()] == [2]


def test_open_ended_range_scan(spark, sf_dir):
    out = _orders_range_path(spark, sf_dir)
    n_hi = range_scan(spark, out, lo=ORDERS_PRICE_BOUNDS[-1]).count()
    expected = (
        load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= ORDERS_PRICE_BOUNDS[-1]).count()
    )
    assert n_hi == expected


def test_marker_written(spark, sf_dir):
    out = _orders_range_path(spark, sf_dir)
    assert os.path.exists(os.path.join(out, RANGE_PARTITION_MARKER))
