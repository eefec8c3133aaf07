"""Bucketed table layout (SURVEY.md §2.C7 — the reference's buckets).

The reference's storage hash-buckets data below the partition level
(bucketId per scan task, ArgodbMapreduceInputFormat.java:164-175); the
Spark-native equivalent is ``bucketBy`` on write, which lets later
joins and aggregations on the bucket key skip their shuffle entirely —
the layout-level optimization that matters most for repeated big joins
at 100 TB (the Llama/SIGMOD-2011 colocation idea from PAPERS.md).

Demonstrated as a library function + plan-level test rather than an
oracle query (results are identical to the unbucketed join by
construction; the *plan difference* is the point).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from argodb_mapreduce_spark.catalog import load_table

N_BUCKETS = 8


def _ensure_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write lineitem+orders bucketed by the join key (once per sf)."""
    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    li_name = f"bkt_lineitem_{tag}"
    o_name = f"bkt_orders_{tag}"

    # spark.sql.warehouse.dir is static; session.get_spark points it at
    # tmp. The in-memory metastore resets per session while the warehouse
    # directory survives — clear a stale location before re-creating.
    def ensure(name: str, table: str, key: str) -> None:
        if spark.catalog.tableExists(name):
            return
        import shutil

        loc = os.path.join(spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"), name)
        shutil.rmtree(loc, ignore_errors=True)
        (
            load_table(spark, sf_dir, table)
            .write.bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(name)
        )

    ensure(li_name, "lineitem", "l_orderkey")
    ensure(o_name, "orders", "o_orderkey")
    return li_name, o_name


def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem⋈orders on the bucket key: no shuffle on either side."""
    li_name, o_name = _ensure_bucketed_tables(spark, sf_dir)
    li = spark.table(li_name)
    o = spark.table(o_name)
    return li.join(o, li.l_orderkey == o.o_orderkey).select("l_orderkey", "l_quantity", "o_totalprice")


def unbucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same join over raw parquet — shuffles both sides (the contrast)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return li.join(o, li.l_orderkey == o.o_orderkey).select("l_orderkey", "l_quantity", "o_totalprice")
