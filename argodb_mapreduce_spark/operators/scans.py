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
