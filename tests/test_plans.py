"""Physical-plan quality gates — the 100 TB properties, asserted.

Correctness says the operators compute the right answer; these tests
say the *plans* are the ones we'd want on a 1000-executor cluster:
pushdown reaches the scan, projections prune columns, partition
filters prune directories, small dims broadcast, bucketing elides
shuffles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from argodb_mapreduce_spark.catalog import load_table
from argodb_mapreduce_spark.operators.relational import (
    join_broadcast_dim,
    q1_pricing_summary,
    q5_local_supplier_volume,
)
from argodb_mapreduce_spark.operators.scans import partitioned_lineitem, scan_projection
from argodb_mapreduce_spark.plans.checks import (
    explain_str,
    has_broadcast_join,
    n_exchanges,
    partition_filters,
    pushed_filters,
    read_schema,
)
from argodb_mapreduce_spark.sources.bucketing import bucketed_join, unbucketed_join


def test_projection_prunes_read_schema(spark, sf_dir):
    rs = read_schema(scan_projection(spark, sf_dir))
    assert "l_orderkey" in rs and "l_extendedprice" in rs
    assert "l_comment" not in rs and "l_shipdate" not in rs and "l_quantity" not in rs


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = q1_pricing_summary(spark, sf_dir)
    assert "l_shipdate" in pushed_filters(df), "shipdate predicate must reach the parquet scan"


def test_partition_pruning(spark, sf_dir):
    from argodb_mapreduce_spark.catalog import scan

    path = partitioned_lineitem(spark, sf_dir)
    df = scan(spark, path, filter="l_returnflag=R")
    assert "l_returnflag" in partition_filters(df), "equality on partition col must become a PartitionFilter"


def test_small_dims_broadcast(spark, sf_dir):
    assert has_broadcast_join(join_broadcast_dim(spark, sf_dir))
    assert has_broadcast_join(q5_local_supplier_volume(spark, sf_dir))


def test_q5_single_shuffle_for_fact_join(spark, sf_dir):
    # 6-way snowflake: every dim broadcasts; only lineitem⋈orders plus the
    # final aggregation may shuffle. Allow a small bound, not 6 joins' worth.
    df = q5_local_supplier_volume(spark, sf_dir)
    assert n_exchanges(df) <= 4, f"too many exchanges: {n_exchanges(df)}"


def test_bucketed_join_elides_shuffle(spark, sf_dir):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        nb = n_exchanges(unbucketed_join(spark, sf_dir))
        b = n_exchanges(bucketed_join(spark, sf_dir))
        assert b < nb, f"bucketed join should shuffle less: bucketed={b} unbucketed={nb}"
        assert b == 0, f"co-bucketed equi-join should need zero exchanges, got {b}"
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_same_result(spark, sf_dir):
    a = bucketed_join(spark, sf_dir)
    b = unbucketed_join(spark, sf_dir)
    assert a.count() == b.count()
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0


def test_events_ts_is_timestamp(spark, sf_dir):
    # Always ltz TIMESTAMP, never the raw epoch-nanos bigint and never
    # ntz: read_parquet_any normalizes both TIMESTAMP(NANOS) fixtures
    # (bridge) and TIMESTAMP(MICROS)/ntz fixtures (cast) to one flavor,
    # so unix_micros / watermarks / time-range frames work unchanged.
    assert dict(load_table(spark, sf_dir, "events").dtypes)["ts"] == "timestamp"


def test_no_collect_in_operators():
    """Operators must never materialize to the driver (100 TB stance)."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent / "argodb_mapreduce_spark"
    offenders = []
    tagged = []
    for p in root.rglob("*.py"):
        lines = p.read_text().splitlines()
        for i, line in enumerate(lines, 1):
            if ".collect()" in line or ".toPandas()" in line:
                window = lines[max(0, i - 12) : i]
                if any("metadata-collect:" in w for w in window):
                    tagged.append(f"{p.name}:{i}")
                else:
                    offenders.append(f"{p.name}:{i}")
    # dedup_minhash_clusters uses a bounded .count() for convergence —
    # counts are aggregates, not materialization; collect/toPandas are out.
    # EXCEPTION CLASS (must carry an explicit `metadata-collect:` tag
    # within the 11 lines above): plan-time collection of BOUNDED
    # METADATA — bloom bit positions (<= m ints), DV-delta file lists
    # (O(changed files)), MERGE touched-file lists (O(matched files)).
    # This is the same driver-side work as reading the manifest itself,
    # and exactly how Delta computes its touched-file sets; data rows
    # must still never be collected.
    assert not offenders, f"driver-side materialization found: {offenders}"
    # r14 audit (12): the r13 nine — bloom words O(m/64); delete_keys
    # prune key sample O(cap, limit-bounded); the DISTRIBUTED over-cap
    # prune's surviving segment names O(segments); pruned-delete
    # query's own O(K) key set; the restore-synthesis DV-delta file
    # list O(changed files); two more changed-file lists O(files);
    # MERGE touched-file discovery O(files); CDC replicator's
    # delete/upsert presence counts (2 rows per micro-batch after the
    # latest-image collapse) — plus three r14 additions: diff_keys' DV-symmetric-
    # difference file list O(changed files) and its prune-bound meta,
    # and the keyed re-encrypting writer's one-summary-row-per-file
    # harvest O(files). The r14 optimization round adds two more of the
    # bloom-build class: build_grouped_blooms' per-group HLL sizing row
    # (one row per staged segment) and its packed-word toPandas
    # (O(sum m/64) longs) — the single-pass replacement for N
    # per-segment build_segment_bloom calls, same boundedness.
    # Batch-4 of the r14 optimization round adds two of the delete_keys
    # prune-key-sample class inside merge_upsert's literal-IN fast
    # path: the limit(cap+1) source key sample (<= cap+1 single-column
    # rows; over-cap falls back to the broadcast semi-join) and the
    # target-matched subset of that same capped set for the CDF
    # post/ins legs. All bounded metadata, never data rows.
    assert len(tagged) <= 16, f"metadata-collect tag creep — audit: {tagged}"


def test_decode_stub_raises():
    from argodb_mapreduce_spark.operators.multimodal import decode_image

    try:
        decode_image(None)
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError:
        pass


def test_dynamic_partition_pruning(spark, sf_dir):
    """DPP: a filtered dim joined on the partition column injects a
    dynamicpruning subquery into the partitioned scan — pruning the
    reference could never do (it only pruned static equality)."""
    from argodb_mapreduce_spark.plans.checks import explain_str

    path = partitioned_lineitem(spark, sf_dir)
    part_tbl = spark.read.parquet(path)
    dim = spark.createDataFrame([("R", "returned")], "flag string, label string").filter(
        F.col("label") == "returned"
    )
    joined = part_tbl.join(dim, part_tbl.l_returnflag == dim.flag)
    plan = explain_str(joined, "formatted").lower()
    assert "dynamicpruning" in plan, "expected a dynamic partition pruning subquery in the scan"


def test_scan_partition_dynamic_prunes_at_runtime(spark, sf_dir):
    """The REGISTERED DPP query (oracle-checked): the filtered year dim
    must inject a dynamicpruning subquery into the partitioned fact's
    scan, and the dim must broadcast so the pruning subquery reuses the
    exchange."""
    from argodb_mapreduce_spark.sources.hive_partitions import scan_partition_dynamic

    df = scan_partition_dynamic(spark, sf_dir)
    plan = explain_str(df, "formatted").lower()
    assert "dynamicpruning" in plan, "dim filter did not become a runtime partition filter"
    assert has_broadcast_join(df)


def test_chunking_is_shuffle_free(spark, sf_dir):
    from argodb_mapreduce_spark.operators.training_data import chunk_documents

    assert n_exchanges(chunk_documents(spark, sf_dir)) == 0


def test_decontam_broadcasts_benchmark_set(spark, sf_dir):
    from argodb_mapreduce_spark.operators.training_data import decontam_ngram_overlap

    # The corpus-side probe must be a broadcast join — the corpus scan
    # never shuffles for the membership check (only the per-doc distinct
    # and final count aggregations shuffle).
    assert has_broadcast_join(decontam_ngram_overlap(spark, sf_dir))


def test_kmeans_assignment_broadcasts_centroids(spark, sf_dir):
    from argodb_mapreduce_spark.operators.clustering import kmeans_assign

    plan = kmeans_assign(spark, sf_dir)
    assert "BroadcastNestedLoopJoin" in __import__(
        "argodb_mapreduce_spark.plans.checks", fromlist=["explain_str"]
    ).explain_str(plan, "simple")


def test_pack_sequences_single_wide_shuffle(spark, sf_dir):
    from argodb_mapreduce_spark.operators.training_data import pack_sequences

    # One shuffle for the per-source window; the final groupBy reduces
    # map-side so a second exchange (if AQE keeps it) moves O(bins) rows.
    assert n_exchanges(pack_sequences(spark, sf_dir)) <= 2


def test_multilevel_partition_pruning(spark, sf_dir):
    from argodb_mapreduce_spark.sources.hive_partitions import sink_partitioned_multilevel

    pf = partition_filters(sink_partitioned_multilevel(spark, sf_dir))
    assert "o_year" in pf and "o_orderstatus" in pf, pf


def test_vocab_join_is_broadcast(spark, sf_dir):
    from argodb_mapreduce_spark.operators.ingest import vocab_coverage

    # The token stream (TB-scale at 100 TB) must probe the V-row vocab
    # map-side; a shuffle join here would move the whole corpus.
    assert has_broadcast_join(vocab_coverage(spark, sf_dir))


def test_incremental_dedup_no_cartesian(spark, sf_dir):
    from argodb_mapreduce_spark.operators.ingest import dedup_incremental

    plan = explain_str(dedup_incremental(spark, sf_dir), "simple")
    assert "CartesianProduct" not in plan, "band join must be an equi-join, never all-pairs"


def test_shuffle_shard_no_global_sort(spark, sf_dir):
    from argodb_mapreduce_spark.operators.ingest import shuffle_shard_deterministic

    # Per-shard windows hash-partition by shard; a rangepartitioning
    # exchange would mean a global sort (driver-scale bottleneck).
    plan = explain_str(shuffle_shard_deterministic(spark, sf_dir), "formatted").lower()
    assert "hashpartitioning(shard" in plan, plan[:500]
    assert "rangepartitioning" not in plan


def test_survivor_quality_single_shuffle(spark, sf_dir):
    from argodb_mapreduce_spark.operators.ingest import dedup_survivor_quality

    # Same one-shuffle shape as dedup_exact: one window over the content
    # hash computes both rank and copy count.
    assert n_exchanges(dedup_survivor_quality(spark, sf_dir)) == 1


def test_shingle_exchange_reused_not_cached(spark, sf_dir):
    """The shared shingle table must feed its consumers through ONE
    exchange (ReusedExchange), not an explicit persist(): a cache would
    outlive the query in a long-lived session (VERDICT r3 wrong-item 1),
    while exchange reuse gives single-computation with lineage intact."""
    from argodb_mapreduce_spark.operators.dedup import dedup_minhash_verified, dedup_ngram_jaccard
    from argodb_mapreduce_spark.operators.ingest import dedup_incremental

    # ReuseExchange is a static preparation rule only without AQE (AQE does
    # the same dedup at runtime via its stage cache).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for q in (dedup_minhash_verified, dedup_ngram_jaccard, dedup_incremental):
            plan = explain_str(q(spark, sf_dir), "formatted")
            assert "ReusedExchange" in plan, f"{q.__name__}: shingle exchange not reused"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_registry_queries_leave_no_cache(spark, sf_dir):
    """No persisted RDDs or CacheManager entries may survive a registry
    query — executor memory must not accumulate across queries in a
    long-lived session (VERDICT r3 wrong-item 1)."""
    from argodb_mapreduce_spark.operators.dedup import dedup_minhash_verified, dedup_ngram_jaccard
    from argodb_mapreduce_spark.operators.ingest import dedup_incremental

    before = {int(k) for k in spark.sparkContext._jsc.getPersistentRDDs().keySet()}
    for q in (dedup_minhash_verified, dedup_ngram_jaccard, dedup_incremental):
        q(spark, sf_dir).count()
    after = {int(k) for k in spark.sparkContext._jsc.getPersistentRDDs().keySet()}
    assert after - before == set(), f"leaked persisted RDDs: {after - before}"
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        "CacheManager entries leaked by a registry query"
    )


def test_band_join_aqe_skew_split(spark, tmp_path):
    """Skew resilience of the LSH band-bucket self-join (VERDICT r2/r3
    task 6): a hot bucket (50% of docs byte-identical, so they share
    every band hash) must be split by AQE's OptimizeSkewedJoin —
    SortMergeJoin(skew=true) in the final plan — instead of funneling
    the whole bucket through one reducer. Thresholds are lowered to
    witness the mechanism at fixture scale; at 100 TB the defaults
    (256 MB / 5x median) trigger on real hot buckets."""
    import os

    from pyspark.sql import functions as F

    from argodb_mapreduce_spark.operators.dedup import (
        _band_table,
        _doc_shingles,
        _minhash_signature,
    )

    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 2 == 0,
            F.lit("hot hot hot common duplicated text shared by half the corpus every even doc"),
        )
        .otherwise(
            F.concat(
                F.lit("unique text body number "),
                F.col("id").cast("string"),
                F.lit(" with filler words alpha beta gamma delta epsilon zeta "),
                F.col("id").cast("string"),
            )
        )
        .alias("text"),
        F.lit("srcA").alias("source"),
        F.lit("en").alias("lang"),
        F.lit(80).alias("n_chars"),
    )
    fixture = str(tmp_path / "hotshingle")
    docs.write.mode("overwrite").parquet(os.path.join(fixture, "documents.parquet"))

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

        bt = _band_table(_minhash_signature(_doc_shingles(spark, fixture)))
        a, b = bt.alias("a"), bt.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.band_hash") == F.col("b.band_hash")),
            )
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
            .distinct()
            .groupBy()
            .count()
        )
        [[n_pairs]] = pairs.collect()
        # 1000 identical docs -> C(1000,2) candidate pairs at minimum.
        assert n_pairs >= 499500, n_pairs
        final_plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:1500]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_winnow_fingerprint_zero_shuffle(spark, sf_dir):
    """Winnowing is per-document work over data already co-located in its
    source row; the Arrow-vectorized mapInPandas kernel must plan with
    NO exchange at all — at 100 TB this runs map-only. (History:
    explode→window→distinct shuffled O(total chars) twice; the r4
    array-HOF rewrite was shuffle-free but CodegenFallback-interpreted,
    ~5x slower than the numpy kernel — see make_winnow_fn.)"""
    from argodb_mapreduce_spark.functions.text import text_fingerprint_winnow

    df = text_fingerprint_winnow(spark, sf_dir)
    assert n_exchanges(df) == 0
    assert "MapInPandas" in explain_str(df, "simple")


def test_lsh_verify_inside_bucket_groups(spark, sf_dir):
    """The LSH near-dup verify must run as a grouped pandas stage over
    (band, bucket) — each vector crosses to Python once per band — with
    only the bucket shuffle and the cross-band distinct as exchanges.
    The old shape (candidate pair join + per-pair HOF cosine) re-joined
    the full embedding arrays onto every candidate pair."""
    from argodb_mapreduce_spark.operators.similarity import similarity_lsh_neardup

    df = similarity_lsh_neardup(spark, sf_dir)
    plan = explain_str(df, "formatted")
    assert "FlatMapGroupsInPandas" in plan, "verify not a grouped pandas stage"
    assert n_exchanges(df) <= 2, f"too many exchanges: {n_exchanges(df)}"


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """Spark injects a runtime bloom filter from a selectively-filtered
    dim side into the fact scan of a shuffle join (semi-join reduction)
    — fact rows that cannot match are dropped BEFORE the shuffle. At
    100 TB the default thresholds (10GB application-side scan) enable
    this automatically; the fixture scan is far below them, so the test
    lowers the threshold to witness the plan shape."""
    from argodb_mapreduce_spark.plans.checks import explain_str

    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_thr = spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
        plan = explain_str(li.join(o, li.l_orderkey == o.o_orderkey), "formatted")
        assert "bloom_filter_agg" in plan and "might_contain" in plan, plan[:800]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", old_thr)


def test_bm25_query_side_broadcasts(spark, sf_dir):
    """BM25's probe-query and stats tables are tiny and must broadcast
    onto the tf table — the scoring join may not shuffle the corpus —
    and the final top-k must plan as TakeOrderedAndProject."""
    from argodb_mapreduce_spark.operators.retrieval import text_bm25_topk

    plan = explain_str(text_bm25_topk(spark, sf_dir), "formatted")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_count_min_probe_broadcasts(spark, sf_dir):
    """The CMS heavy-hitter probe joins the counter table via broadcast;
    only the vocabulary groupBy and the cell aggregation shuffle."""
    from argodb_mapreduce_spark.operators.sketches import sketch_count_min

    plan = explain_str(sketch_count_min(spark, sf_dir), "formatted")
    assert "BroadcastHashJoin" in plan


def test_salted_agg_partial_keys_include_salt(spark, sf_dir):
    """The two-phase salted aggregation must shuffle FIRST on
    (group, salt) — spreading a heavy-hitter group across reducers —
    and only then collapse (groups x salts) to the final answer."""
    from argodb_mapreduce_spark.operators.merge import agg_salted_skew

    plan = explain_str(agg_salted_skew(spark, sf_dir), "formatted")
    import re

    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("salt" in p and "o_orderpriority" in p for p in parts), parts


def test_sessionize_single_user_shuffle(spark, sf_dir):
    """Sessionization is one shuffle on user_id: the lag window, the
    running-sum window, and the session groupBy all share the user_id
    partitioning, so Catalyst plans exactly one exchange — the property
    that makes the shape linear at 100 TB."""
    from argodb_mapreduce_spark.operators.sessions import events_sessionize
    from argodb_mapreduce_spark.plans.checks import n_exchanges

    assert n_exchanges(events_sessionize(spark, sf_dir)) == 1


def test_scd2_single_user_shuffle(spark, sf_dir):
    """SCD2 derivation likewise plans one user_id exchange: change
    detection (lag) and interval close (lead) ride the same window
    partitioning."""
    from argodb_mapreduce_spark.operators.sessions import scd2_user_history
    from argodb_mapreduce_spark.plans.checks import n_exchanges

    assert n_exchanges(scd2_user_history(spark, sf_dir)) == 1


def test_pagerank_scans_fact_once(spark, sf_dir):
    """After the edge-list localCheckpoint, the iteration plan contains
    no lineitem scan at all — the heavy 4-table join ran exactly once
    at checkpoint time; iterations join the materialized ≤625-row edge
    table."""
    from argodb_mapreduce_spark.operators.graph import graph_pagerank
    from argodb_mapreduce_spark.plans.checks import explain_str

    plan = explain_str(graph_pagerank(spark, sf_dir), "formatted")
    assert "lineitem" not in plan.lower(), plan[:1500]
    assert "ExistingRDD" in plan or "LocalTableScan" in plan or "Scan" in plan


def test_span_dedup_no_cross_join(spark, sf_dir):
    """Span dedup is window + regroup — no join of any kind in the
    plan (the keep-first decision is a row_number, not a self-join)."""
    from argodb_mapreduce_spark.operators.dedup import dedup_span_exact
    from argodb_mapreduce_spark.plans.checks import explain_str

    plan = explain_str(dedup_span_exact(spark, sf_dir), "formatted")
    assert "Join" not in plan, plan[:1500]


def test_markov_transition_single_user_shuffle(spark, sf_dir):
    """The transition matrix needs exactly one data-sized shuffle (the
    user_id window); pair counting aggregates the window output without
    repartitioning and the row-normalizing join broadcasts the
    |event_types|-row totals."""
    from argodb_mapreduce_spark.operators.sessions import events_markov_transition
    from argodb_mapreduce_spark.plans.checks import explain_str

    plan = explain_str(events_markov_transition(spark, sf_dir), "formatted")
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, plan[:1500]


def test_triangle_count_scans_fact_once(spark, sf_dir):
    """After the undirected-edge localCheckpoint the triangle triple
    join plans against the materialized edge RDD — no lineitem rescan
    (three references to the edge list would otherwise re-run the
    4-table fact join three times)."""
    from argodb_mapreduce_spark.operators.graph import graph_triangle_count
    from argodb_mapreduce_spark.plans.checks import explain_str

    plan = explain_str(graph_triangle_count(spark, sf_dir), "formatted")
    assert "lineitem" not in plan.lower(), plan[:1500]


def test_fuzzy_levenshtein_blocked_not_cross(spark, sf_dir):
    """The edit-distance self-join shuffles on the (lang, band) block
    key — an equi-join, never a cartesian pair enumeration; the doc_id
    ordering and distance threshold ride as post-join filters."""
    from argodb_mapreduce_spark.operators.dedup import dedup_fuzzy_levenshtein
    from argodb_mapreduce_spark.plans.checks import explain_str

    plan = explain_str(dedup_fuzzy_levenshtein(spark, sf_dir), "formatted")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan[:1500]


def test_weighted_bernoulli_single_exchange(spark, sf_dir):
    """Importance sampling is map-side (hash, threshold, filter all
    inside the scan stage) plus exactly one exchange for the final
    per-priority summary — the shape that stays linear at 100 TB."""
    from argodb_mapreduce_spark.operators.sampling import sample_weighted_bernoulli
    from argodb_mapreduce_spark.plans.checks import n_exchanges

    assert n_exchanges(sample_weighted_bernoulli(spark, sf_dir)) == 1


def test_basket_lift_no_cartesian_pairs(spark, sf_dir):
    """Pair support comes from an equi-join on the basket key (fan-out
    bounded by order width); the only nested-loop join in the plan is
    the 1-row basket-count scalar broadcast."""
    from argodb_mapreduce_spark.operators.bi import basket_pair_lift
    from argodb_mapreduce_spark.plans.checks import explain_str

    plan = explain_str(basket_pair_lift(spark, sf_dir), "formatted")
    assert "CartesianProduct" not in plan, plan[:1500]
    # formatted mode prints each node twice (tree + detail), so ONE
    # nested-loop node shows up as two matching lines.
    assert plan.count("BroadcastNestedLoopJoin") <= 2, plan[:1500]
    assert "SortMergeJoin Inner" in plan or "ShuffledHashJoin Inner" in plan or "BroadcastHashJoin" in plan


def test_ewma_single_exchange_one_window(spark, sf_dir):
    """All 8 EWMA taps ride one user_id window sort: a single exchange
    and a single Window operator — adding taps must not add shuffles."""
    from argodb_mapreduce_spark.operators.analytics import events_ewma_smooth
    from argodb_mapreduce_spark.plans.checks import explain_str, n_exchanges

    df = events_ewma_smooth(spark, sf_dir)
    assert n_exchanges(df) == 1
    plan = explain_str(df, "formatted")
    assert plan.count("Window") <= 2, plan[:1500]


def test_ols_trend_broadcasts_means(spark, sf_dir):
    """The regression's second pass joins the 5-row means back over the
    per-day aggregate via broadcast — the fact table is aggregated once
    and never shuffle-joined."""
    from argodb_mapreduce_spark.operators.bi import orders_ols_trend
    from argodb_mapreduce_spark.plans.checks import explain_str

    plan = explain_str(orders_ols_trend(spark, sf_dir), "formatted")
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, plan[:1500]


def test_migration_fingerprint_map_side_reduce(spark, sf_dir):
    """The checksum is render+hash map-side plus one global aggregate:
    a single exchange moving partial sums, nothing else."""
    from argodb_mapreduce_spark.operators.profiling import table_migration_fingerprint
    from argodb_mapreduce_spark.plans.checks import explain_str, n_exchanges

    df = table_migration_fingerprint(spark, sf_dir)
    assert n_exchanges(df) <= 1
    assert "Join" not in explain_str(df, "formatted")


def test_lateral_topk_decorrelates_to_ranked_join(spark, sf_dir):
    """Catalyst must decorrelate the LATERAL subquery — the physical
    plan is a window/rank + join, never a per-row nested execution
    (no nested-loop join of the fact side)."""
    from argodb_mapreduce_spark.operators.modern_sql import join_lateral_topk
    from argodb_mapreduce_spark.plans.checks import explain_str

    plan = explain_str(join_lateral_topk(spark, sf_dir), "formatted")
    assert "Window" in plan or "rank" in plan.lower(), plan[:1500]
    assert "CartesianProduct" not in plan, plan[:1500]


def test_recursive_cte_executes_natively(spark, sf_dir):
    """The recursion runs inside Spark (UnionLoop / recursive node in
    the plan) and terminates at log2(maxkey) levels with one row per
    (customer, level) — the linear-recursion bound."""
    from argodb_mapreduce_spark.operators.modern_sql import recursive_cte_ancestors

    df = recursive_cte_ancestors(spark, sf_dir)
    rows = {r["c_custkey"]: r for r in df.collect()}
    import math

    for key in list(rows)[:20]:
        assert rows[key]["n_ancestors"] == int(math.log2(key)), (key, rows[key])
        assert rows[key]["root_key"] == 1


def test_abc_windows_run_over_part_aggregate(spark, sf_dir):
    """The Pareto cumulative must consume the per-part aggregate, never
    raw lineitem — and since round 7 it is the DISTRIBUTED two-pass
    prefix sum: the cumulative window partitions by _pid (each executor
    sums its own key range) and the only join is the broadcast of the
    O(P) partition-offset table. The stronger plan-shape assertions
    (single-partition exchanges fed only by the _pid sums) live in
    tests/test_rank_distributed.py."""
    from argodb_mapreduce_spark.operators.bi import parts_abc_classification
    from argodb_mapreduce_spark.plans.checks import explain_str

    plan = explain_str(parts_abc_classification(spark, sf_dir), "formatted")
    assert "Window" in plan
    assert "partial_sum" in plan or "HashAggregate" in plan
    # the running-sum window is per-partition, not a global sort
    assert "windowspecdefinition(_pid" in plan, plan[:1500]


def test_attribution_single_user_shuffle(spark, sf_dir):
    """Attribution is one user_id window + filter — a single exchange,
    no self-join of the event log."""
    from argodb_mapreduce_spark.operators.sessions import events_attribution_last_touch
    from argodb_mapreduce_spark.plans.checks import explain_str, n_exchanges

    df = events_attribution_last_touch(spark, sf_dir)
    assert n_exchanges(df) == 1
    assert "Join" not in explain_str(df, "formatted")


def test_pca_iterations_scan_embeddings_once(spark, sf_dir):
    """After the covariance localCheckpoint the power-iteration plan
    joins the materialized 4096-row matrix — no embeddings rescan per
    iteration."""
    from argodb_mapreduce_spark.operators.clustering import embedding_pca_top_component
    from argodb_mapreduce_spark.plans.checks import explain_str

    plan = explain_str(embedding_pca_top_component(spark, sf_dir), "formatted")
    assert "embeddings" not in plan.lower(), plan[:1500]


def test_pq_encode_codebook_broadcasts(spark, sf_dir):
    """The PQ argmin must be a broadcast join of the 16-seed codebook
    onto the subspace rows (no shuffle of the corpus against the
    codebook) and a combiner-reduced min aggregate, not a window sort."""
    from argodb_mapreduce_spark.operators.similarity import similarity_pq_encode
    from argodb_mapreduce_spark.plans.checks import explain_str, has_broadcast_join

    df = similarity_pq_encode(spark, sf_dir)
    assert has_broadcast_join(df)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_pq_adc_lut_broadcasts_onto_codes(spark, sf_dir):
    """ADC search reads the code table and broadcasts the per-query
    LUT — the scan side must never shuffle for the lookup join."""
    from argodb_mapreduce_spark.operators.similarity import (
        similarity_ivfpq_topk,
        similarity_pq_adc_topk,
    )
    from argodb_mapreduce_spark.plans.checks import explain_str, has_broadcast_join

    for df in (similarity_pq_adc_topk(spark, sf_dir), similarity_ivfpq_topk(spark, sf_dir)):
        assert has_broadcast_join(df)
        assert "CartesianProduct" not in explain_str(df, "simple").replace(
            "BroadcastNestedLoopJoin", ""
        )


def test_dq_audit_broadcasts_nation_and_scans_once_per_rule_table(spark, sf_dir):
    """The 25-row nation dim must broadcast in the RI check; the
    lineitem per-table rules ride ONE aggregate (the Deequ one-pass
    shape), so the plan has no more than the expected lineitem scans
    (rules pass + RI join side)."""
    from argodb_mapreduce_spark.operators.profiling import dq_constraint_audit
    from argodb_mapreduce_spark.plans.checks import explain_str, has_broadcast_join

    df = dq_constraint_audit(spark, sf_dir)
    assert has_broadcast_join(df)
    plan = explain_str(df, "formatted")
    assert plan.lower().count("lineitem.parquet") <= 2, "per-rule scans must be fused"


def test_rake_topk_is_take_ordered(spark, sf_dir):
    """The RAKE top-20 must compile to TakeOrderedAndProject, not a
    global sort of every phrase."""
    from argodb_mapreduce_spark.functions.text import text_keyword_rake
    from argodb_mapreduce_spark.plans.checks import explain_str

    plan = explain_str(text_keyword_rake(spark, sf_dir), "simple")
    assert "TakeOrderedAndProject" in plan, plan[:1200]


def test_welch_single_pass_no_join(spark, sf_dir):
    """Six conditional aggregates in one scan: no join, one exchange
    (the 1-row final aggregation)."""
    from argodb_mapreduce_spark.operators.analytics import events_ab_welch_t
    from argodb_mapreduce_spark.plans.checks import explain_str, n_exchanges

    df = events_ab_welch_t(spark, sf_dir)
    assert "Join" not in explain_str(df, "formatted")
    assert n_exchanges(df) == 1


def _rank_windows_are_pre_aggregated(df):
    """Every cumulative-rank window (the sum(cnt) windows built by
    functions/rank_stats.py) must take a HISTOGRAM as input: walking
    down the plan from the Window node, a HashAggregate must appear
    before any FileScan — i.e. the total order only ever sorts
    pre-aggregated (bounded) rows, never the fact table."""
    from argodb_mapreduce_spark.plans.checks import explain_str

    lines = explain_str(df, "simple").splitlines()
    win_idx = [i for i, ln in enumerate(lines) if "Window [sum(cnt" in ln]
    assert win_idx, "expected at least one cumulative-rank window in the plan"
    for i in win_idx:
        for ln in lines[i + 1:]:
            if "HashAggregate" in ln:
                break
            assert "FileScan" not in ln and "Scan parquet" not in ln, (
                f"rank window at plan line {i} reads unaggregated fact rows:\n"
                + "\n".join(lines[i:i + 6])
            )


def test_interarrival_rank_input_is_histogram(spark, sf_dir):
    """orders_interarrival_stats (VERDICT r5 item 3): the exact
    median/p90 rank must run over the per-gap histogram, so the
    single-partition window input is O(distinct gaps), not O(orders)."""
    from argodb_mapreduce_spark.operators.bi import orders_interarrival_stats

    _rank_windows_are_pre_aggregated(orders_interarrival_stats(spark, sf_dir))


def test_median_and_cleaning_rank_inputs_are_histograms(spark, sf_dir):
    """agg_median_manual and the cleaning pack share the two-phase
    rank shape: per-group windows sort distinct grid values, never
    fact rows."""
    from argodb_mapreduce_spark.functions.stats import agg_median_manual
    from argodb_mapreduce_spark.operators.cleaning import clean_winsorize, events_anomaly_mad

    _rank_windows_are_pre_aggregated(agg_median_manual(spark, sf_dir))
    _rank_windows_are_pre_aggregated(clean_winsorize(spark, sf_dir))
    _rank_windows_are_pre_aggregated(events_anomaly_mad(spark, sf_dir))


def test_png_decode_pipeline_is_shuffle_free(spark, sf_dir):
    """Both Arrow stages of the PNG round trip chain onto the scan with
    at most the ONE RoundRobin spread of the raw input (r15,
    multimodal._codec_parallel — same gate shape as the JPEG/CDC
    pipelines): at 100 TB the PNG containers and pixel volume never
    cross the network, and the row-group gate drops even the raw-bytes
    spread on a multi-row-group corpus."""
    from argodb_mapreduce_spark.operators.multimodal import multimodal_image_decode

    df = multimodal_image_decode(spark, sf_dir)
    assert n_exchanges(df) <= 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("RoundRobinPartitioning") <= 1
    # the spread must carry only the RAW input, never the PNG container
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert "png" not in ln, ln


def test_png_histogram_shuffles_only_bin_partials(spark, sf_dir):
    """The decode->aggregate pipeline's only exchanges carry O(bins)
    partial-count rows (groupBy on bin + the broadcast of the tiny
    aggregate), never pixels or PNG blobs."""
    from argodb_mapreduce_spark.operators.multimodal import multimodal_image_histogram

    df = multimodal_image_histogram(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    exchange_lines = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert exchange_lines, "expected the bin groupBy shuffle to exist"
    for ln in exchange_lines:
        assert "png" not in ln and "content" not in ln, ln


def test_cdc_single_shuffle(spark, sf_dir):
    """Boundary detection + segmentation are per-row array expressions;
    only the chunk-hash aggregate (and its top-k) may exchange — plus
    the ONE RoundRobin spread of the raw input (r14 opt,
    catalog.cpu_repartition: the single-row-group fixture is
    unsplittable, so without it the per-char boundary hash runs as one
    task). Any further exchange is a regression."""
    from argodb_mapreduce_spark.operators.dedup import dedup_cdc_chunks

    df = dedup_cdc_chunks(spark, sf_dir)
    assert n_exchanges(df) <= 3
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("RoundRobinPartitioning") <= 1


def test_semantic_dedup_broadcasts_centroids(spark, sf_dir):
    """The k-means assignment inside SemDeDup must broadcast the K
    centroids — the vector table reaches the pairwise stage without an
    assignment shuffle."""
    from argodb_mapreduce_spark.operators.clustering import dedup_semantic_clusters

    plan = dedup_semantic_clusters(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_delete_keys_discovery_is_broadcast_semi_join(spark, tmp_path):
    """The erase path's touched-row discovery must ship the key set
    broadcast (no shuffle of the table side) — the O(K) contract,
    asserted on the PRODUCTION helper delete_keys itself calls."""
    from argodb_mapreduce_spark.sources.versioned import (
        _matched_positions,
        _read_segment_dirs,
        _read_manifest,
        versioned_write,
    )

    p = str(tmp_path / "dkplan")
    versioned_write(spark.range(5000).withColumnRenamed("id", "k"), p)
    latest = _read_manifest(p)[-1]
    scan = _read_segment_dirs(spark, p, latest["segments"], latest, evolved=False, with_pos=True)
    keys = spark.range(0, 50).withColumnRenamed("id", "k")
    matched = _matched_positions(scan, keys, "k")
    plan = explain_str(matched)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_cdf_update_sidecar_scan_is_pruned_to_touched(spark, tmp_path):
    """The UPDATE's CDC legs read only min/max-surviving segments: a
    4-segment key-ranged table with a one-segment window plans one
    segment's files in the pre/post scan."""
    from argodb_mapreduce_spark.sources.versioned import (
        _read_manifest,
        _touched_segments,
        versioned_write,
    )

    p = str(tmp_path / "cdcplan")
    for i in range(4):
        versioned_write(
            spark.range(i * 100, (i + 1) * 100).withColumnRenamed("id", "k"),
            p,
            mode="append",
        )
    latest = _read_manifest(p)[-1]
    preds = [("k", ">=", 120), ("k", "<", 180)]
    touched = _touched_segments(latest, preds)  # the PRODUCTION pruning
    assert touched == ["data-1"]  # exactly what update_where rewrites
