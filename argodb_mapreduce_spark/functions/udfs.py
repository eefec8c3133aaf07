"""User-defined function surface (SURVEY.md §2.B8).

The reference's entire purpose is feeding arbitrary user Java code in
map/reduce tasks; the Spark-native equivalents, each demonstrated with
an oracle-checked query:

* row-at-a-time Python UDF      — the slow path, kept off hot loops;
* Arrow-vectorized pandas UDF   — the fast scalar path (~10-100×);
* grouped-aggregate pandas UDF  — custom UDAFs;
* applyInPandas                 — per-group custom logic (UDAF/transform);
* Python UDTF                   — one-to-many table functions.

Every UDF here is arithmetic-deterministic (integer or single-pass
IEEE double per row) so results hash-match DuckDB exactly; sums inside
UDAFs are done on integers to stay order-independent.

All callables are nested/local so cloudpickle ships them by value
(executors do not have this repo importable).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 - resolves pandas_udf type hints at decoration time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from argodb_mapreduce_spark.catalog import load_table
from argodb_mapreduce_spark.registry import register


@register(
    "udf_python_rowwise",
    oracle="""
    SELECT c_custkey, CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bracket
    FROM customer
    """,
    tags=("udf",),
    doc="Row-at-a-time Python UDF (the slow path — per-row serde; shown for surface completeness).",
)
def udf_python_rowwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    @F.udf("long")
    def bracket(bal: float) -> int:
        return int(math.floor(bal / 1000.0))

    return load_table(spark, sf_dir, "customer").select("c_custkey", bracket("c_acctbal").alias("bal_bracket"))


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    """,
    tags=("udf", "pandas-udf"),
    doc="Arrow-vectorized scalar pandas UDF: per-row IEEE double math, bit-identical to the SQL expression.",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("double")
    def net(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1 - disc)

    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", net("l_extendedprice", "l_discount").alias("net_price"))


@register(
    "udf_pandas_grouped_agg",
    oracle="""
    SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("udf", "pandas-udf", "udaf"),
    doc="Grouped-aggregate pandas UDF (custom UDAF): integer summation keeps it order-independent.",
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("long")
    def int_sum(qty: pd.Series) -> int:
        return int(qty.astype("int64").sum())

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(int_sum("l_quantity").alias("total_qty"))


@register(
    "udf_apply_in_pandas",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) AS mean_price
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("udf", "pandas-udf", "udaf"),
    doc=(
        "applyInPandas per-group UDAF: mean price via exact integer cents "
        "(round(p*100) is deterministic — the scaled double is computed "
        "identically in numpy and both SQL engines)."
    ),
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    def mean_cents(pdf):
        import numpy as np
        import pandas as pd

        cents = np.round(pdf["o_totalprice"].to_numpy() * 100.0).astype("int64")
        return pd.DataFrame(
            {
                "o_orderstatus": [pdf["o_orderstatus"].iloc[0]],
                "mean_price": [float(cents.sum()) / 100.0 / len(cents)],
            }
        )

    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").applyInPandas(mean_cents, schema="o_orderstatus string, mean_price double")


@register(
    "udtf_tokenize",
    oracle="""
    SELECT doc_id, CAST(pos AS INT) AS pos, toks[pos] AS tok
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 10),
         UNNEST(range(1, len(toks) + 1)) AS u(pos)
    """,
    tags=("udf", "udtf"),
    doc="Python UDTF (one row → many): positional tokenizer, the lateral-view/table-function surface.",
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, tok string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            for i, tok in enumerate(text.split(" "), start=1):
                yield doc_id, i, tok

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    d.createOrReplaceTempView("udtf_docs_in")
    spark.udtf.register("tokenize_udtf", Tokenize)
    return spark.sql("SELECT t.* FROM udtf_docs_in, LATERAL tokenize_udtf(doc_id, text) t")
