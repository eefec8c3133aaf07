"""Cost-based optimization: table statistics drive join reordering.

The reference has no optimizer at all — the InputFormat hands splits to
user MapReduce code and join order is whatever the user hard-coded
(SURVEY.md §2 notes this as the largest semantic upgrade Spark brings).
Catalyst's CBO (`spark.sql.cbo.enabled` + `ANALYZE TABLE ... COMPUTE
STATISTICS`) closes the loop: with row/column stats in the catalog, the
join-reorder rule rewrites a badly-ordered snowflake (fact ⋈ fact ⋈
dim ⋈ selective-dim, in that literal order) so the selective dimension
joins first and the big fact last — the plan a query author on the
reference would have to hand-craft.

Scale story: on a 1000-executor cluster the difference between the
literal order (lineitem ⋈ orders first: a fact-fact shuffle join whose
intermediate is the whole join) and the CBO order (customer ⋈ nation
first: a broadcast-sized intermediate that filters everything
downstream) is the difference between shuffling 100 TB and shuffling
megabytes. `ANALYZE` is O(table) once, amortized across every query.
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession

from argodb_mapreduce_spark.catalog import fixture_stale, load_table, table_path
from argodb_mapreduce_spark.registry import register

#: Tables staged into the session catalog (external, under /tmp) so
#: ANALYZE can attach stats. Keyed per sf_dir; session-local.
#: r14: stage ONLY the columns the snowflake query references — join
#: reorder costs from row counts + per-column NDV/min-max of the keys
#: it sees, so the other 20 columns bought nothing but write+ANALYZE
#: time (lineitem FOR ALL COLUMNS was the single biggest job here).
#: Row counts (the fact/dim asymmetry the reorder keys on) are
#: unchanged by projection.
_CBO_TABLES = {
    "nation": ["n_nationkey", "n_name"],
    "customer": ["c_custkey", "c_nationkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
}
_STAGED: dict[tuple[int, str], bool] = {}


def _tag(sf_dir: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", sf_dir.strip("/"))


def _stage_tables(spark: SparkSession, sf_dir: str) -> str:
    """Register the snowflake tables as EXTERNAL catalog tables (parquet
    under /tmp, never the warehouse dir — the driver session's cwd must
    stay untouched) and ANALYZE them. Idempotent per (session, sf_dir)."""
    prefix = f"argodb_cbo_{_tag(sf_dir)}"
    key = (id(spark), prefix)
    root = os.path.join(tempfile.gettempdir(), "argodb_mapreduce_spark", _tag(sf_dir), "cbo")
    # v2 marker: the staged layout changed (projected columns) — a v1
    # full-column staging must not be adopted as fresh.
    marker = os.path.join(root, "_STAGED_NARROW")
    data_fresh = not fixture_stale(table_path(sf_dir, "lineitem"), marker)
    if _STAGED.get(key) and data_fresh:
        return prefix
    os.makedirs(root, exist_ok=True)
    for t, cols in _CBO_TABLES.items():
        name = f"{prefix}_{t}"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        path = os.path.join(root, t)
        if not data_fresh:
            # Stage (rewrite) the projected parquet copy.
            load_table(spark, sf_dir, t).select(*cols).write.mode(
                "overwrite"
            ).parquet(path)
        # Fresh data on disk: REGISTER it (catalog + stats are
        # session-memory, the parquet is not) without rewriting — a new
        # session pays only CREATE TABLE + ANALYZE over the key columns.
        # Schema from the catalog's own (footer-derived) table schema —
        # plan-only, no inference job over the staged files.
        ddl = load_table(spark, sf_dir, t).select(*cols).schema.toDDL()
        spark.sql(
            f"CREATE TABLE {name} ({ddl}) USING parquet LOCATION '{path}'"
        )
        # Row + column stats: join reorder costs with both. Only the
        # staged (referenced) columns exist, so ALL COLUMNS is now the
        # targeted set.
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR ALL COLUMNS")
    with open(marker, "w") as fh:
        fh.write("ok")
    _STAGED[key] = True
    return prefix


def _snowflake_sql(prefix: str) -> str:
    """Deliberately bad literal order: the two facts join FIRST; only
    the final join reaches the selective NATION_7 dimension filter."""
    return f"""
    SELECT n.n_name AS n_name, COUNT(*) AS cnt
    FROM {prefix}_lineitem l
    JOIN {prefix}_orders o ON l.l_orderkey = o.o_orderkey
    JOIN {prefix}_customer c ON o.o_custkey = c.c_custkey
    JOIN {prefix}_nation n ON c.c_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_7'
    GROUP BY n.n_name
    """


def _relation_order(df: DataFrame, prefix: str) -> list[str]:
    """Base-relation order in the optimized logical plan (left-to-right
    = join order after reordering)."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return re.findall(rf"{prefix}_(\w+)", plan)


def _with_cbo(spark: SparkSession, enabled: bool):
    prior = (
        spark.conf.get("spark.sql.cbo.enabled", "false"),
        spark.conf.get("spark.sql.cbo.joinReorder.enabled", "false"),
    )
    spark.conf.set("spark.sql.cbo.enabled", str(enabled).lower())
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", str(enabled).lower())
    return prior


def _restore_cbo(spark: SparkSession, prior) -> None:
    spark.conf.set("spark.sql.cbo.enabled", prior[0])
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", prior[1])


def cbo_reorder_evidence(spark: SparkSession, sf_dir: str) -> dict:
    """Optimized-plan relation order with CBO off vs on (stats present).

    Returns {"off": [...], "on": [...], "fired": bool} — `fired` means
    the reorder moved the big fact (lineitem) off the leading position
    and joined the selective dimension (nation) earlier than the
    literal query text does.
    """
    prefix = _stage_tables(spark, sf_dir)
    q = _snowflake_sql(prefix)
    prior = _with_cbo(spark, False)
    try:
        off = _relation_order(spark.sql(q), prefix)
        _with_cbo(spark, True)
        on = _relation_order(spark.sql(q), prefix)
    finally:
        _restore_cbo(spark, prior)
    fired = (
        on != off
        and on.index("nation") < on.index("lineitem")
        and off.index("lineitem") < off.index("nation")
    )
    return {"off": off, "on": on, "fired": fired}


@register(
    "cbo_join_reorder",
    oracle="""
    SELECT n.n_name AS n_name, CAST(COUNT(*) AS BIGINT) AS cnt,
           TRUE AS reorder_fired
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_7'
    GROUP BY n.n_name
    """,
    tags=("optimizer", "cbo", "join"),
    doc=(
        "Cost-based join reordering: ANALYZE TABLE puts row+column stats "
        "in the catalog, spark.sql.cbo.enabled + joinReorder rewrite a "
        "deliberately fact-first snowflake so the selective nation "
        "dimension joins before the lineitem fact. The reorder_fired "
        "column is computed by diffing the optimized plans with CBO off "
        "vs on (hash-checked against TRUE), and the aggregate itself "
        "runs under the reordered plan — correctness and the optimizer "
        "behavior are pinned in one row. The reference has no optimizer; "
        "this is the Catalyst capability a migrating user gains."
    ),
)
def cbo_join_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    evidence = cbo_reorder_evidence(spark, sf_dir)
    prefix = _stage_tables(spark, sf_dir)
    prior = _with_cbo(spark, True)
    try:
        result = spark.sql(_snowflake_sql(prefix))
        out = result.withColumn("reorder_fired", F.lit(bool(evidence["fired"])))
        # materialize under CBO so the reordered plan actually executes
        out = out.localCheckpoint(eager=True)
    finally:
        _restore_cbo(spark, prior)
    return out
