"""Modern-SQL operator surface: LATERAL correlated joins and recursive
CTEs — capabilities the reference delegates to its MapReduce layer
(SURVEY.md §2.B4's join inventory / §2.B3's iteration gap) that Spark 4
executes natively in Catalyst.

``join_lateral_topk`` is the correlated per-row-subquery form of
top-k-per-group: Catalyst decorrelates the LATERAL subquery into a
ranked window join, so the declarative "for each customer, its top
orders" form costs the same plan as the explicit window rewrite
(``topk_per_group``) — registered separately because the *operator* (a
correlated lateral relation) is distinct even when the physical plan
converges.

``recursive_cte_ancestors`` exercises Spark 4's WITH RECURSIVE over a
deterministic key-halving hierarchy (parent = key DIV 2 — a binary
tree over custkeys, root 1). Linear recursion: every row spawns at
most one child, so the working set NEVER exceeds the input size per
level and depth is log2(max key) — the recursion shape that stays
bounded at 100 TB, unlike graph traversals whose UNION ALL frontier
can multiply (Spark's recursive CTE currently supports UNION ALL only;
the dedup CC loops remain the scale path for those).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from argodb_mapreduce_spark.catalog import load_table
from argodb_mapreduce_spark.registry import register

TOPK_PER_CUSTOMER = 2


@register(
    "join_lateral_topk",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
    FROM customer c
    CROSS JOIN LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT {TOPK_PER_CUSTOMER}
    ) t
    """,
    tags=("join", "lateral", "topk"),
    doc=(
        "Correlated LATERAL top-k: for each customer, its "
        f"{TOPK_PER_CUSTOMER} highest-value orders, written as a "
        "per-row subquery instead of a window. Catalyst decorrelates "
        "the lateral relation into a ranked join — same shuffle "
        "discipline as the window form, declarative per-row semantics. "
        "Fully ordered (price DESC, orderkey) so the k-subset is "
        "deterministic on both engines."
    ),
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_lat_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_lat_orders")
    return spark.sql(
        f"""
        SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
        FROM v_lat_customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM v_lat_orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT {TOPK_PER_CUSTOMER}
        ) t
        """
    )


@register(
    "recursive_cte_ancestors",
    oracle="""
    WITH RECURSIVE anc(custkey, cur) AS (
      SELECT CAST(c_custkey AS BIGINT), CAST(c_custkey AS BIGINT) FROM customer
      UNION ALL
      SELECT custkey, cur // 2 FROM anc WHERE cur > 1
    )
    SELECT custkey AS c_custkey,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_ancestors,
           CAST(MIN(cur) AS BIGINT) AS root_key
    FROM anc GROUP BY custkey
    """,
    tags=("recursion", "iterative"),
    doc=(
        "WITH RECURSIVE ancestor walk over the key-halving hierarchy "
        "(parent = key DIV 2): per customer, its chain length to root. "
        "Linear recursion — one child per row per level, log2(maxkey) "
        "levels — executed natively by Spark 4's recursive CTE and "
        "hash-checked against DuckDB's."
    ),
)
def recursive_cte_ancestors(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_rec_customer")
    return spark.sql(
        """
        WITH RECURSIVE anc(custkey, cur) AS (
          SELECT CAST(c_custkey AS BIGINT), CAST(c_custkey AS BIGINT)
          FROM v_rec_customer
          UNION ALL
          SELECT custkey, cur DIV 2 FROM anc WHERE cur > 1
        )
        SELECT custkey AS c_custkey,
               CAST(COUNT(*) - 1 AS BIGINT) AS n_ancestors,
               MIN(cur) AS root_key
        FROM anc GROUP BY custkey
        """
    )


@register(
    "fn_variant_extract",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           CAST(COUNT(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS distinct_k
    FROM events
    GROUP BY event_type
    """,
    tags=("function", "variant", "json", "modern-sql"),
    doc=(
        "Spark 4 VARIANT type: parse_json lifts the events.props JSON "
        "string into the binary VARIANT encoding once, then typed "
        "variant_get path extraction feeds a per-event_type aggregate. "
        "VARIANT is the semi-structured scale path — the shredded "
        "binary form is parsed once at ingest instead of re-parsing "
        "the JSON string in every expression, and path extraction is "
        "O(path) on the encoded tree. DuckDB oracle uses json_extract "
        "on the same strings; results are exact integers."
    ),
)
def fn_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At 100 TB: props parses to VARIANT in the scan projection
    (map-side, once), the aggregate is map-combinable on event_type —
    one O(groups) shuffle. Reference parity: the serde bridge's string
    column carrying JSON (ArgodbSerdeUtils.java:35-102 maps it to a
    plain STRING; every downstream consumer re-parses) — VARIANT is
    the Spark-4 upgrade of that contract."""
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "events").select("event_type", "props")
    v = e.select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'long')").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.max("k").alias("max_k"),
        F.count_distinct(F.col("k")).alias("distinct_k"),
    )


@register(
    "pipe_syntax_priority_summary",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             AS total_price
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
    tags=("modern-sql", "pipe-syntax", "agg"),
    doc=(
        "Spark 4 SQL pipe syntax (|>): the same filter -> aggregate "
        "plan written as a left-to-right pipeline (FROM orders |> WHERE "
        "... |> AGGREGATE ... GROUP BY ...). Compiles to the identical "
        "Catalyst plan as the ANSI form — registered to pin the modern "
        "SQL surface, priced with the exact-decimal sum so the DOUBLE "
        "result hash-matches the ANSI oracle."
    ),
)
def pipe_syntax_priority_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipe syntax is sugar over the same logical plan — predicate
    pushdown and partial aggregation apply unchanged, so the 100x story
    is q1's. The exact-decimal SUM pattern (functions/oracle_safe) is
    inlined in SQL form."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_pipe_orders")
    return spark.sql(
        """
        FROM v_pipe_orders
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE COUNT(*) AS n_orders,
                     CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS STRING) AS DOUBLE)
                       AS total_price
           GROUP BY o_orderpriority
        |> SELECT o_orderpriority, n_orders, total_price
        """
    )
