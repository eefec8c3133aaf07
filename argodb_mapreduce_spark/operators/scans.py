"""Scan/source queries (SURVEY.md §2.A1/A2/A4).

The reference's direct operator surface: full columnar scan, projection
(plumbed in the reference, exercised here — Catalyst prunes columns all
the way into the parquet reader), and the ``"col=value"`` partition
filter with its quote-stripping sugar.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from argodb_mapreduce_spark.catalog import fixture_stale, load_table, scan, table_path
from argodb_mapreduce_spark.registry import register


def _cache_dir(sf_dir: str, name: str) -> str:
    """Deterministic scratch dir for derived table layouts."""
    tag = sf_dir.strip("/").replace("/", "_")
    return os.path.join(tempfile.gettempdir(), "argodb_mapreduce_spark", tag, name)


def partitioned_lineitem(spark: SparkSession, sf_dir: str) -> str:
    """Write (once) a Hive-layout copy of lineitem partitioned by
    l_returnflag, the fixture analogue of an ArgoDB single-value
    partitioned table (ArgodbMapreduceInputFormat.java:211-251).
    """
    out = _cache_dir(sf_dir, "lineitem_by_returnflag")
    marker = os.path.join(out, "_SUCCESS")
    if fixture_stale(table_path(sf_dir, "lineitem"), marker):
        (
            load_table(spark, sf_dir, "lineitem")
            .write.mode("overwrite")
            .partitionBy("l_returnflag")
            .parquet(out)
        )
    return out


@register(
    "scan_lineitem",
    oracle="SELECT * FROM lineitem",
    tags=("scan",),
    doc="Full columnar snapshot scan (ArgodbMapreduceInputFormat.java:104-199).",
)
def scan_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem")


@register(
    "scan_projection",
    oracle="SELECT l_orderkey, l_extendedprice FROM lineitem",
    tags=("scan",),
    doc=(
        "Projection pushdown — plumbed but never exercised in the reference "
        "(always all columns, ArgodbMapreduceInputFormat.java:134,287-288); "
        "Catalyst prunes to a 2-column parquet ReadSchema."
    ),
)
def scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scan(spark, table_path(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice"])


@register(
    "scan_partition_filter",
    oracle="SELECT * FROM lineitem WHERE l_returnflag = 'R'",
    tags=("scan", "partition-pruning"),
    doc=(
        "Reference filter string 'col=value' over a partitioned table "
        "(ArgodbMapreduceInputFormat.java:208-255) → Catalyst directory "
        "pruning. Quoted form col=\"value\" is equivalent "
        "(ArgodbSerdeUtils.java:18-26)."
    ),
)
def scan_partition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = partitioned_lineitem(spark, sf_dir)
    df = scan(spark, path, filter='l_returnflag="R"')
    # Partition values are reconstructed from directory names and appear
    # as trailing columns (ArgodbMapreduceRecordReader.java:182-198);
    # reorder to the base schema for the oracle compare and restore the
    # parquet-written timestamp type.
    base = load_table(spark, sf_dir, "lineitem")
    return df.select(*[F.col(c).cast(dict(base.dtypes)[c]) for c in base.columns])


@register(
    "scan_partition_nomatch",
    oracle="SELECT * FROM lineitem WHERE l_returnflag = 'Z'",
    tags=("scan", "partition-pruning"),
    doc=(
        "Filter matching no partition → empty result, not an error "
        "(ArgodbMapreduceInputFormat.java:123-125,246-248)."
    ),
)
def scan_partition_nomatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = partitioned_lineitem(spark, sf_dir)
    df = scan(spark, path, filter="l_returnflag=Z")
    base = load_table(spark, sf_dir, "lineitem")
    return df.select(*[F.col(c).cast(dict(base.dtypes)[c]) for c in base.columns])


@register(
    "scan_events",
    oracle="SELECT event_id, ts, user_id, event_type, value, props FROM events",
    tags=("scan",),
    doc=(
        "Full events scan: proves the TIMESTAMP(NANOS) bridge — Spark "
        "reads epoch-nanos as long and truncates to µs exactly like "
        "DuckDB's ns→µs conversion (catalog.load_table)."
    ),
)
def scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@register(
    "scan_embeddings",
    oracle="""
    SELECT vec_id,
           array_to_string(list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)), ',') AS embedding_q,
           label
    FROM embeddings
    """,
    tags=("scan", "vector"),
    doc=(
        "Full embeddings scan. The vector column is exposed as an exact "
        "integer-quantized string (round(x * 2^20) — power-of-two scaling "
        "is exact in double, so both engines round identically): the "
        "driver's value hash cannot hash a top-level array column "
        "(CORRECTNESS_r01 scan_embeddings), and float→string formatting "
        "differs between JVM and DuckDB. The raw ArrayType(Float) scan is "
        "covered by tests/test_scan_semantics.py."
    ),
)
def scan_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.array_join(
            F.transform(
                F.col("embedding"),
                lambda x: F.round(x.cast("double") * F.lit(1048576.0)).cast("long").cast("string"),
            ),
            ",",
        ).alias("embedding_q"),
        "label",
    )


def _evolved_orders(spark: SparkSession, sf_dir: str) -> str:
    """Stage (once) a two-generation table: segment 1 holds the original
    5-column orders subset, segment 2 adds an o_channel column — the
    add-a-column schema evolution every long-lived table goes through."""
    out = _cache_dir(sf_dir, "orders_evolved")
    marker = os.path.join(out, "_STAGED")
    if fixture_stale(table_path(sf_dir, "orders"), marker):
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        o = load_table(spark, sf_dir, "orders")
        old = o.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
        )
        new = o.filter(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority",
            F.when(F.col("o_custkey") % 2 == 0, F.lit("web")).otherwise(F.lit("store")).alias("o_channel"),
        )
        old.write.parquet(os.path.join(out, "gen=1"))
        new.write.parquet(os.path.join(out, "gen=2"))
        with open(marker, "w") as f:
            f.write("ok")
    return out


@register(
    "scan_schema_evolution",
    oracle="""
    WITH unioned AS (
      SELECT o_orderkey, o_orderstatus, CAST(NULL AS VARCHAR) AS o_channel
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_custkey % 2 = 0 THEN 'web' ELSE 'store' END AS o_channel
      FROM orders WHERE o_orderkey % 2 = 1
    )
    SELECT COALESCE(o_channel, '<pre-evolution>') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key
    FROM unioned GROUP BY 1
    """,
    tags=("scan", "source", "schema-evolution"),
    doc=(
        "Schema-evolution read: a table whose newer segment added an "
        "o_channel column is read as ONE DataFrame via mergeSchema — "
        "pre-evolution rows surface NULL for the new column (grouped "
        "here under a sentinel) with no rewrite of old files. The "
        "reference's fixed getTableSchema contract "
        "(ArgodbMapreduceInputFormat.java:307-313) cannot express this; "
        "Spark's parquet source merges footers at plan time."
    ),
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read across an add-a-column schema change without rewriting.

    Scale design: mergeSchema unions the footers of the generations at
    planning (cost O(files), done once by the driver-side listing); the
    scan itself stays a plain columnar read with the new column
    NULL-filled for old files by the reader — no data migration, which
    at 100 TB is the difference between a metadata operation and a
    multi-day backfill.
    """
    path = _evolved_orders(spark, sf_dir)
    df = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(path, "gen=1"), os.path.join(path, "gen=2")
    )
    return (
        df.groupBy(
            F.coalesce(F.col("o_channel"), F.lit("<pre-evolution>")).alias("channel")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_orderkey").cast("long").alias("min_key"),
        )
    )
