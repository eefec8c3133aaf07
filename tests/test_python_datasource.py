"""Python DataSource ('argodb_versioned') — the InputFormat-contract
properties: file-aligned splits, snapshot pinning, version addressing."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from argodb_mapreduce_spark.sources.python_datasource import read_versioned
from argodb_mapreduce_spark.sources.versioned import (
    snapshot_read,
    versioned_write,
)


def _mk(spark, tmp_path) -> str:
    path = str(tmp_path / "pyds_vt")
    versioned_write(spark.range(20).withColumnRenamed("id", "k").repartition(3), path)
    versioned_write(spark.range(20, 30).withColumnRenamed("id", "k").repartition(2), path)
    return path


def test_one_partition_per_file(spark, tmp_path):
    path = _mk(spark, tmp_path)
    n_files = sum(
        1
        for seg in ("data-0", "data-1")
        for f in os.listdir(os.path.join(path, seg))
        if f.endswith(".parquet")
    )
    df = read_versioned(spark, path, 1)
    assert df.rdd.getNumPartitions() == n_files  # getSplits ≙ partitions()


def test_matches_native_snapshot_read_per_version(spark, tmp_path):
    path = _mk(spark, tmp_path)
    for v in (0, 1):
        got = sorted(r["k"] for r in read_versioned(spark, path, v).collect())
        want = sorted(r["k"] for r in snapshot_read(spark, path, v).collect())
        assert got == want


def test_plan_time_snapshot_pinning(spark, tmp_path):
    path = _mk(spark, tmp_path)
    df = read_versioned(spark, path)  # latest = v1, file set pinned at plan time
    # A concurrent writer publishes v2 (overwrite) AFTER planning.
    versioned_write(spark.range(100, 103).withColumnRenamed("id", "k"), path, mode="overwrite")
    assert sorted(r["k"] for r in df.collect()) == list(range(30))  # still v1
    assert sorted(r["k"] for r in read_versioned(spark, path).collect()) == [100, 101, 102]


def test_aggregation_pushes_through(spark, tmp_path):
    path = _mk(spark, tmp_path)
    row = read_versioned(spark, path, 1).agg(
        F.count(F.lit(1)).alias("n"), F.sum("k").alias("s")
    ).collect()[0]
    assert (row["n"], row["s"]) == (30, sum(range(30)))
