"""Graph analytics over relational edges: deterministic PageRank
(SURVEY.md §2.B3/B4 composite; the iterative-algorithm family beside
``kmeans_lloyd_step`` and the dedup connected-components loops).

``graph_pagerank`` ranks nations by trade flow: edges are
(supplier nation → customer nation) weighted by lineitem count — the
q7-shaped 4-table join — then 3 damped power iterations
(d = 0.85, uniform teleport) over the aggregated graph.

Scale design: the expensive part is building the edge list — a full
fact-table join-aggregate that shuffles on the join keys and reduces to
|nations|² ≤ 625 rows. The iterations are joins over that tiny
aggregate (broadcast-sized); each iteration re-references the same
edge subtree, and AQE's exchange reuse serves it from the first
materialization rather than rescanning the fact table. Rank sums use
the power-of-two-grid pattern (oracle_safe.gsum: per-row contributions
are irrational ratio products, where a decimal cast can double-round in
DuckDB) so the result is bit-identical at any parallelism — on 1000 executors the per-dst
contribution sum is order-independent. The fixed iteration count (no
convergence probe) keeps the plan static and the oracle expressible as
a chained-CTE SQL twin.

Determinism notes: every float op is an IEEE double op with a fixed
association order (w/outw division, r*ratio product, 2^-40-grid exact
sum, 0.006 + 0.85*s affine step), so Spark and DuckDB agree bitwise.
N = 25 nations is fixed by the TPC-H spec at every scale factor; the
teleport term (1-d)/N = 0.006 is a literal on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from argodb_mapreduce_spark.catalog import load_table
from argodb_mapreduce_spark.functions.oracle_safe import gsum, sql_gsum
from argodb_mapreduce_spark.registry import register

#: Damping factor and iteration count (fixed — keeps the oracle a
#: finite CTE chain and the plan static).
DAMPING = 0.85
N_ITER = 3
#: TPC-H has exactly 25 nations at every scale factor.
N_NATIONS = 25
_TELEPORT = (1.0 - DAMPING) / N_NATIONS  # 0.006


def _sql_pagerank() -> str:
    parts = [
        """
    WITH e AS (
      SELECT CAST(s.s_nationkey AS BIGINT) AS src,
             CAST(c.c_nationkey AS BIGINT) AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY src, dst
    ), ow AS (
      SELECT src, SUM(w) AS outw FROM e GROUP BY src
    ), er AS (
      SELECT e.src, e.dst, e.w / ow.outw AS ratio FROM e JOIN ow ON ow.src = e.src
    ), r0 AS (
      SELECT CAST(n_nationkey AS BIGINT) AS node, n_name,
             CAST(0.04 AS DOUBLE) AS r
      FROM nation
    )"""
    ]
    for k in range(1, N_ITER + 1):
        prev = f"r{k - 1}"
        parts.append(
            f""", c{k} AS (
      SELECT er.dst AS node, {sql_gsum("p.r * er.ratio")} AS s
      FROM er JOIN {prev} p ON p.node = er.src GROUP BY er.dst
    ), dm{k} AS (
      SELECT {sql_gsum("p.r")} AS dm
      FROM {prev} p WHERE NOT EXISTS (SELECT 1 FROM ow WHERE ow.src = p.node)
    ), r{k} AS (
      SELECT n.node, n.n_name,
             CAST({_TELEPORT!r} AS DOUBLE)
               + CAST({DAMPING!r} AS DOUBLE)
                 * (COALESCE(c{k}.s, CAST(0 AS DOUBLE))
                    + COALESCE(dm{k}.dm, CAST(0 AS DOUBLE)) / CAST({N_NATIONS} AS DOUBLE)) AS r
      FROM {prev} n LEFT JOIN c{k} ON c{k}.node = n.node CROSS JOIN dm{k}
    )"""
        )
    parts.append(
        f"""
    SELECT node AS nation_key, n_name, r AS pagerank FROM r{N_ITER}
    """
    )
    return "".join(parts)


@register(
    "graph_pagerank",
    oracle=_sql_pagerank(),
    tags=("graph", "iterative", "join"),
    doc=(
        f"PageRank over the nation trade graph: edges = supplier-nation → "
        f"customer-nation weighted by lineitem count (q7-shaped fact join, "
        f"the only heavy stage), then {N_ITER} damped power iterations "
        f"(d={DAMPING}) as tiny joins over the ≤{N_NATIONS}² aggregated "
        "edge list. Power-of-two-grid contribution sums keep the doubles "
        "bit-identical at any parallelism."
    ),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .groupBy(
            s.s_nationkey.cast("long").alias("src"),
            c.c_nationkey.cast("long").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    er = edges.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("outw")).alias("ratio")
    )
    # The iterations reference er (and its src set) 2× per round; without
    # lineage truncation each reference re-executes the 4-table fact
    # join. localCheckpoint materializes the ≤|nations|² aggregated edge
    # list once (the same pattern as the dedup CC loop's per-round
    # checkpoint) — the heavy stage runs exactly once, iterations then
    # join tiny cached rows. Bench: 3.85 s → the fact-join cost once.
    er = er.localCheckpoint()
    has_out = er.select("src").distinct()
    nodes = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("node"), "n_name"
    )
    ranks = nodes.withColumn("r", F.lit(1.0 / N_NATIONS))
    # The iteration phase runs over the CHECKPOINTED ≤N_NATIONS²-row
    # edge list and the N_NATIONS-row rank vector — bounded by the
    # TPC-H spec, not by scale — so it executes under bounded-loop
    # planner settings (tuning.scoped_conf: AQE off, width 1): with AQE
    # on, every Exchange of the 3-iteration chain became its own
    # query-stage job (measured 34 jobs / best 5.4 s for this query;
    # the per-job fixed cost IS the iteration cost at 25 rows). The
    # final localCheckpoint materializes all N_ITER rounds as ONE
    # action inside the scope; results are partitioning-independent by
    # the gsum grid design, so the hash is unchanged.
    from argodb_mapreduce_spark.tuning import bounded_loop_conf, scoped_conf

    with scoped_conf(spark, bounded_loop_conf(width=1)):
        for _ in range(N_ITER):
            contrib = er.join(
                ranks.select(F.col("node").alias("src"), "r"), "src"
            ).select("dst", (F.col("r") * F.col("ratio")).alias("rc"))
            summed = contrib.groupBy("dst").agg(gsum("rc").alias("s"))
            # Dangling-node mass (nodes with no out-edges — at small SFs
            # most nations have no supplier) is redistributed uniformly,
            # the canonical PageRank treatment; without it rank mass
            # leaks and the sum-to-1 invariant
            # (test_pagerank_mass_and_bounds) breaks.
            dangling = (
                ranks.join(has_out, ranks.node == has_out.src, "left_anti")
                .agg(gsum("r").alias("dm"))
            )
            ranks = (
                ranks.select("node", "n_name")
                .join(summed, F.col("node") == F.col("dst"), "left")
                .crossJoin(F.broadcast(dangling))
                .select(
                    "node",
                    "n_name",
                    (
                        F.lit(_TELEPORT)
                        + F.lit(DAMPING)
                        * (
                            F.coalesce(F.col("s"), F.lit(0.0))
                            + F.coalesce(F.col("dm"), F.lit(0.0))
                            / F.lit(float(N_NATIONS))
                        )
                    ).alias("r"),
                )
            )
        ranks = ranks.localCheckpoint()
    return ranks.select(
        F.col("node").alias("nation_key"), "n_name", F.col("r").alias("pagerank")
    )


_TRIANGLE_SQL = """
    WITH e0 AS (
      SELECT DISTINCT CAST(s.s_nationkey AS BIGINT) AS src,
                      CAST(c.c_nationkey AS BIGINT) AS dst
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE s.s_nationkey <> c.c_nationkey
    ), und AS (
      SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e0
    ), tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM und e1
      JOIN und e2 ON e2.a = e1.b
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ), membership AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS n
      FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      )
      GROUP BY node
    )
    SELECT CAST(n.n_nationkey AS BIGINT) AS nation_key, n.n_name,
           CAST(COALESCE(m.n, 0) AS BIGINT) AS triangles
    FROM nation n
    LEFT JOIN membership m ON m.node = CAST(n.n_nationkey AS BIGINT)
"""


@register(
    "graph_triangle_count",
    oracle=_TRIANGLE_SQL,
    tags=("graph", "join"),
    doc=(
        "Per-node triangle counts on the undirected nation trade graph "
        "(an edge = any lineitem shipped between the two nations). The "
        "fact join builds the edge list once; triangles enumerate as "
        "wedge-join + closing-edge semijoin over key-oriented edges "
        "(a < b < c), so each triangle is found exactly once."
    ),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting — the graph-metrics twin of graph_pagerank.

    Scale design: the only data-sized stage is the 4-table fact join
    that reduces to <= |nations|^2 distinct pairs; it is
    localCheckpoint'ed (same pattern as the PageRank edge list) so the
    two triangle self-joins reread ~300 rows, not the fact table. The
    a < b key orientation enumerates each triangle exactly once; on a
    large general graph the same plan swaps key order for degree order
    (orient each edge toward the higher-degree endpoint), the standard
    O(m^1.5) wedge bound — noted here because 25 fixed nodes make the
    distinction invisible in the fixture.
    """
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    e0 = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .filter(s.s_nationkey != c.c_nationkey)
        .select(
            s.s_nationkey.cast("long").alias("src"),
            c.c_nationkey.cast("long").alias("dst"),
        )
        .distinct()
    )
    und = (
        e0.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint()
    )
    # The triangle enumeration runs over the CHECKPOINTED ≤|nations|²/2
    # undirected edge list — bounded by the TPC-H spec like PageRank's —
    # so it executes under the bounded-loop planner scope (tuning.py:
    # AQE off, width 1, one localCheckpoint action): with AQE on, the
    # two self-joins + membership aggregate over ~300 rows fanned into
    # one query-stage job per Exchange. Counts are exact integers, so
    # the result is partitioning-independent and the hash is unchanged.
    from argodb_mapreduce_spark.tuning import bounded_loop_conf, scoped_conf

    with scoped_conf(spark, bounded_loop_conf(width=1)):
        e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
        e2 = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
        e3 = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
        tri = e1.join(e2, "y").join(e3, ["x", "z"]).select("x", "y", "z")
        membership = (
            tri.select(F.col("x").alias("node"))
            .unionAll(tri.select(F.col("y").alias("node")))
            .unionAll(tri.select(F.col("z").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("n"))
            .localCheckpoint()
        )
    nodes = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("nation_key"), "n_name"
    )
    return nodes.join(
        F.broadcast(membership), nodes.nation_key == membership.node, "left"
    ).select(
        "nation_key", "n_name", F.coalesce(F.col("n"), F.lit(0)).alias("triangles")
    )
