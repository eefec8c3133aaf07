"""MERGE / upsert emulation and skew-safe joins.

The v1 image has no Delta/Iceberg jars, so MERGE INTO is emulated the
classic way (guide pattern): updated-or-inserted rows union'd with the
anti-joined untouched target — one shuffle, no driver involvement.
Skewed joins get an explicit salting helper (the pre-AQE technique;
AQE's skew-join split is also enabled by session defaults) — results
are identical to the plain join by construction, which the oracle
checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from argodb_mapreduce_spark.catalog import load_table
from argodb_mapreduce_spark.registry import register


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """MERGE INTO target USING source ON key: matched → update (source
    wins), unmatched → insert. Both sides keyed uniquely on ``key``."""
    untouched = target.join(source.select(key), key, "left_anti")
    return untouched.unionByName(source)


@register(
    "sink_merge_upsert",
    oracle="""
    WITH source AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal + 1000.0 AS c_acctbal, 'UPGRADED' AS c_mktsegment
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT 900000 + r AS c_custkey, 'Customer#new' AS c_name, CAST(r AS INT) AS c_nationkey,
             0.0 AS c_acctbal, 'NEW' AS c_mktsegment
      FROM (SELECT UNNEST(range(0, 5)) AS r)
    )
    SELECT * FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM source)
    UNION ALL
    SELECT * FROM source
    """,
    tags=("sink", "merge"),
    doc=(
        "MERGE INTO emulation (update-matched + insert-new via anti-join "
        "∪ source): every 10th customer updated, 5 new rows inserted — "
        "the CDC/SCD upsert building block without a lakehouse format."
    ),
)
def sink_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    updates = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") + 1000.0).alias("c_acctbal"),
        F.lit("UPGRADED").alias("c_mktsegment"),
    )
    inserts = spark.range(0, 5).select(
        (F.lit(900000) + F.col("id")).alias("c_custkey"),
        F.lit("Customer#new").alias("c_name"),
        F.col("id").cast("int").alias("c_nationkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    return merge_upsert(c, updates.unionByName(inserts), "c_custkey")


def salted_join(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str, n_salts: int = 8
) -> DataFrame:
    """Skew-safe equi-join: replicate the (small-ish) right side across
    ``n_salts`` buckets and scatter left rows deterministically, so a hot
    key spreads over n_salts reducers instead of one."""
    salted_r = right.select("*", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("salt"))
    salted_l = left.withColumn("salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)))
    cond = (salted_l[left_key] == salted_r[right_key]) & (salted_l["salt"] == salted_r["salt"])
    return salted_l.join(salted_r, cond).drop("salt")


def detect_hot_keys(
    left: DataFrame, left_key: str, hot_factor: float = 1.5
) -> DataFrame:
    """Heavy-hitter join keys: one combiner-reduced count over the fact
    side, keys above ``hot_factor`` x the mean frequency. Returns a
    1-column ``__hk`` DataFrame — broadcast-sized by definition. In
    production this runs ONCE per table (alongside ANALYZE statistics)
    and is reused across queries; the detection pass need not be paid
    per join."""
    cnt = left.groupBy(F.col(left_key).alias("__hk")).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    stats = cnt.agg((F.sum("__cnt") / F.count(F.lit(1))).alias("__mean"))
    return (
        cnt.crossJoin(F.broadcast(stats))
        .filter(F.col("__cnt") > F.lit(hot_factor) * F.col("__mean"))
        .select("__hk")
    )


def targeted_salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 8,
    hot_factor: float = 1.5,
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """Stats-driven skew mitigation (VERDICT r9 #4): salt ONLY the
    heavy-hitter keys.

    The r9 skew bench proved blanket salting LOSES to AQE when AQE can
    split (every key pays the n_salts-way build replication and the
    wider shuffle; SCALING.md round-9 section). The production pattern
    for the cases AQE cannot cover — stream-stream joins, build-side
    skew, fixed-partitioning stages — is targeted: one combiner-reduced
    count over the fact side finds keys whose frequency exceeds
    ``hot_factor`` x mean, ONLY those keys' probe rows are scattered
    over ``n_salts`` reducers and ONLY those keys' build rows replicate;
    every cold key takes the plain single-copy join. Both the hot-key
    set and the threshold stats row stay broadcast-sized by definition
    (heavy hitters are few), so no driver collect is involved.

    Cost model at 100 TB: detection is one map-side-combined groupBy of
    the fact keys (O(distinct keys) shuffle, the same stats ANALYZE
    already gathers — pass ``hot_keys`` to reuse a stored set and skip
    it); the hot branch replicates the build side only
    ``n_hot x n_salts`` rows instead of ``|build| x n_salts``."""
    hot = (
        hot_keys.select(F.col(hot_keys.columns[0]).alias("__hk"))
        if hot_keys is not None
        else detect_hot_keys(left, left_key, hot_factor)
    )
    l_tag = left.join(
        F.broadcast(hot), left[left_key] == hot["__hk"], "left"
    )
    l_hot = l_tag.filter(F.col("__hk").isNotNull()).drop("__hk")
    l_cold = l_tag.filter(F.col("__hk").isNull()).drop("__hk")
    # Cold path: plain single-copy equi-join (AQE/SMJ as Catalyst picks);
    # hot build rows simply find no cold probe partner.
    cold = l_cold.join(right, l_cold[left_key] == right[right_key])
    # Hot path: replicate ONLY the hot build rows across the salts.
    r_hot = right.join(
        F.broadcast(hot), right[right_key] == hot["__hk"], "semi"
    ).select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    )
    l_salt = l_hot.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    hot_joined = l_salt.join(
        r_hot,
        (l_salt[left_key] == r_hot[right_key]) & (l_salt["__salt"] == r_hot["__salt"]),
    ).drop("__salt")
    # POSITIONAL union: both branches emit left columns then right
    # columns in input order, so this matches a plain join's output
    # even when the two sides SHARE a non-key column name — a case a
    # plain equi-join handles (duplicate-named output) but unionByName
    # would reject as ambiguous (r10 ADVICE).
    cold_names = [f.name for f in cold.schema.fields]
    hot_names = [f.name for f in hot_joined.schema.fields]
    assert cold_names == hot_names, (cold_names, hot_names)
    return cold.union(hot_joined)


@register(
    "join_salted_targeted",
    oracle="""
    WITH cnt AS (
      SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY l_orderkey
    ), st AS (SELECT SUM(c) * 1.0 / COUNT(*) AS mean FROM cnt)
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cnt, st WHERE c > 1.5 * mean)
               AS n_hot_keys
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    tags=("join", "skew"),
    doc=(
        "TARGETED salted join (VERDICT r9 #4): heavy-hitter detection "
        "(keys above 1.5x the mean fact-side frequency, computed with "
        "one combiner-reduced count and a broadcast stats row — no "
        "collect) composed with salting of ONLY those keys; cold keys "
        "join single-copy. Result equals the plain join (the oracle), "
        "and the oracle additionally pins the hot-key count so the "
        "detection itself — not just the join output — is hash-checked "
        "on both engines. The skew-bench comparison against blanket "
        "salting and AQE is in SCALING.md round 10."
    ),
)
def join_salted_targeted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from argodb_mapreduce_spark.functions.oracle_safe import dsum

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    # Detect ONCE; the join reuses the set (the stored-stats pattern)
    # and n_hot_keys aggregates the same frame — one detection shuffle
    # per query, not two.
    hot = detect_hot_keys(li, "l_orderkey", hot_factor=1.5)
    joined = targeted_salted_join(
        li, o, "l_orderkey", "o_orderkey", n_salts=8, hot_keys=hot
    )
    hot_n = hot.agg(F.count(F.lit(1)).alias("n_hot_keys"))
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity", 2).alias("sum_qty")
    ).crossJoin(F.broadcast(hot_n))


@register(
    "join_salted_skew",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    tags=("join", "skew"),
    doc=(
        "Salted join: lineitem⋈orders with the right side replicated over "
        "8 salt buckets — identical results to the plain join (the oracle "
        "is the unsalted query), demonstrating the hot-key mitigation."
    ),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from argodb_mapreduce_spark.functions.oracle_safe import dsum

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    joined = salted_join(li, o, "l_orderkey", "o_orderkey", n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity", 2).alias("sum_qty")
    )


@register(
    "agg_salted_skew",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_price
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "skew"),
    doc=(
        "Two-phase SALTED aggregation: pre-aggregate on (group, salt) so "
        "a heavy-hitter group's rows combine across 16 reducers before "
        "the tiny (groups x salts) table collapses to the final answer — "
        "the classic mitigation when one group holds most of a 100 TB "
        "table and even map-side partial aggregation leaves one reducer "
        "hot. Decimal partial sums keep the two-phase result exactly "
        "equal to the single-phase oracle."
    ),
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    n_salts = 16
    partial = (
        o.withColumn("salt", F.pmod(F.hash("o_orderkey"), F.lit(n_salts)))
        .groupBy("o_orderpriority", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("ps"),
        )
    )
    return partial.groupBy("o_orderpriority").agg(
        F.sum("pn").alias("n_orders"),
        F.sum("ps").cast("double").alias("sum_price"),
    )


def merge_apply(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """Full 3-branch MERGE: ``source`` carries an ``_op`` column —
    matched + 'D' → delete, matched + 'U' → update (source wins),
    unmatched + 'U' → insert (unmatched 'D' is a no-op). One anti-join
    on the complete source key set removes update targets and delete
    targets together, then only the upsert rows union back — the same
    single-shuffle shape as merge_upsert, deletes included for free."""
    survivors = target.join(source.select(key), key, "left_anti")
    upserts = source.filter(F.col("_op") == "U").drop("_op")
    return survivors.unionByName(upserts)


@register(
    "sink_merge_with_deletes",
    oracle="""
    WITH source AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal + 1000.0 AS c_acctbal,
             'UPGRADED' AS c_mktsegment, 'U' AS _op
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, 'D' AS _op
      FROM customer WHERE c_custkey % 10 <> 0 AND c_custkey % 7 = 0
      UNION ALL
      SELECT 900000 + r AS c_custkey, 'Customer#new' AS c_name, CAST(r AS INT) AS c_nationkey,
             0.0 AS c_acctbal, 'NEW' AS c_mktsegment, 'U' AS _op
      FROM (SELECT UNNEST(range(0, 5)) AS r)
    )
    SELECT * FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM source)
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM source WHERE _op = 'U'
    """,
    tags=("sink", "merge", "cdc"),
    doc=(
        "Full MERGE with the delete branch — the CDC-apply shape every "
        "lakehouse MERGE INTO supports: a change batch updates every "
        "10th customer, DELETES every 7th (where not updated), inserts "
        "5 new rows. Deletes cost nothing extra: the same anti-join "
        "that clears update targets clears delete targets; only upsert "
        "rows union back."
    ),
)
def sink_merge_with_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-branch MERGE emulation over customer.

    Scale design: identical to sink_merge_upsert — one key-shuffled
    anti-join of the target against the change-batch keys plus a
    union; the _op split is a map-side filter. At 100 TB the anti-join
    is the rewrite cost every non-lakehouse MERGE pays; partition-
    pruned targets (only rewrite touched partitions) are the standard
    refinement and compose with the hive/range sinks here.
    """
    c = load_table(spark, sf_dir, "customer")
    updates = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", "c_name", "c_nationkey",
        (F.col("c_acctbal") + 1000.0).alias("c_acctbal"),
        F.lit("UPGRADED").alias("c_mktsegment"),
        F.lit("U").alias("_op"),
    )
    deletes = c.filter(
        (F.col("c_custkey") % 10 != 0) & (F.col("c_custkey") % 7 == 0)
    ).select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
        F.lit("D").alias("_op"),
    )
    inserts = spark.range(0, 5).select(
        (F.lit(900000) + F.col("id")).alias("c_custkey"),
        F.lit("Customer#new").alias("c_name"),
        F.col("id").cast("int").alias("c_nationkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
        F.lit("U").alias("_op"),
    )
    return merge_apply(c, updates.unionByName(deletes).unionByName(inserts), "c_custkey")
