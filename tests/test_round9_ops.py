"""Round-9 additions: data skipping wiring, ADVICE fixes, CBO evidence."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_assign_blocked_balances_strided_ids(spark):
    """ADVICE r8: ids strided by exactly n_blocks would all collapse into
    one block under plain pmod; the xxhash64 pre-hash must keep realized
    block sizes near the ~1024 target AND preserve bit-exact output."""
    from argodb_mapreduce_spark.operators.clustering import assign, assign_blocked

    n = 4096
    n_blocks = max(1, n // 1024)  # 4 blocks, stride picked adversarially
    stride = n_blocks
    e = (
        spark.range(n)
        .select((F.col("id") * stride).alias("vec_id"))
        .withColumn(
            "qe", F.expr("transform(sequence(1, 8), i -> (vec_id * i) % 97)")
        )
    )
    cent = e.filter(F.col("vec_id") < 8 * stride).select(
        F.col("vec_id").alias("cid"), F.col("qe").alias("qc")
    )
    # realized block sizes: recompute the blocking key the operator uses
    sizes = (
        e.withColumn("blk", F.pmod(F.xxhash64("vec_id"), F.lit(n_blocks)).cast("int"))
        .groupBy("blk")
        .count()
        .collect()
    )
    assert len(sizes) == n_blocks  # every block populated (pmod alone -> 1)
    assert max(r["count"] for r in sizes) < 4 * 1024  # no pile-up
    ref = {(r.vec_id, r.cid, r.dist2) for r in assign(e, cent).collect()}
    blk = {(r.vec_id, r.cid, r.dist2) for r in assign_blocked(e, cent, n).collect()}
    assert blk == ref


def test_bpe_fixture_within_trainer_cap(spark):
    """The _BPE_MAX_TOK cap must be a NO-OP on the fixture corpus (max
    token 8 chars, no '|'), so the guard excludes nothing today and the
    banked oracle evidence stays valid."""
    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.operators.training_data import _BPE_MAX_TOK

    d = load_table(spark, SF, "documents")
    toks = (
        d.select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    bad = toks.filter(
        (F.length("tok") > _BPE_MAX_TOK) | F.col("tok").contains("|")
    ).count()
    assert bad == 0


def test_bpe_repl_passes_cover_cap():
    """Provable bound: a token of length L yields at most floor(L/2)
    boundary-sharing occurrences of any merged pair, so _BPE_REPL passes
    fully merge every token the cap admits."""
    from argodb_mapreduce_spark.operators.training_data import _BPE_MAX_TOK, _BPE_REPL

    assert _BPE_MAX_TOK // 2 <= _BPE_REPL


def test_cbo_join_reorder_fires_with_stats_not_without(spark):
    """The optimizer evidence itself: with ANALYZE stats + CBO the
    optimized plan joins the selective nation dim before the lineitem
    fact; without CBO the literal fact-first order survives."""
    from argodb_mapreduce_spark.operators.cbo import cbo_reorder_evidence

    ev = cbo_reorder_evidence(spark, SF)
    assert ev["off"][0] == "lineitem"  # literal order preserved
    assert ev["off"].index("lineitem") < ev["off"].index("nation")
    assert ev["on"].index("nation") < ev["on"].index("lineitem")  # reordered
    assert ev["fired"] is True


def test_cbo_query_result_independent_of_reordering(spark):
    """Join reordering must never change results: the registered query's
    aggregate equals the plain load_table computation."""
    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.operators.cbo import cbo_join_reorder

    got = {(r.n_name, r.cnt) for r in cbo_join_reorder(spark, SF).collect()}
    l = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    n = load_table(spark, SF, "nation").filter(F.col("n_name") == "NATION_7")
    ref = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .count()
    )
    assert got == {(r.n_name, r["count"]) for r in ref.collect()}


def test_index_refresh_version_history_and_recall(spark):
    """The lifecycle must leave the documented version history (stale
    build -> manifest-only ingest -> retrain republish) and the
    retrained index must strictly beat the stale one on the drifted
    queries in aggregate."""
    import os as _os

    from argodb_mapreduce_spark.operators.similarity import (
        _ensure_refresh_index,
        similarity_index_refresh,
    )
    from argodb_mapreduce_spark.sources.versioned import _read_manifest, versions

    root = _ensure_refresh_index(spark, SF)
    assert versions(_os.path.join(root, "cent")) == [0, 1]
    assert versions(_os.path.join(root, "cbq")) == [0, 1]
    assert versions(_os.path.join(root, "codes")) == [0, 1, 2]
    # the ingest (codes v1) reuses v0's segment — manifest-only append
    entries = {e["version"]: e for e in _read_manifest(_os.path.join(root, "codes"))}
    assert entries[1]["segments"][0] == entries[0]["segments"][0]
    assert len(entries[1]["segments"]) == 2
    # the retrain overwrote: v2 references a single fresh segment
    assert len(entries[2]["segments"]) == 1
    assert entries[2]["segments"][0] not in entries[1]["segments"]

    rows = similarity_index_refresh(spark, SF).collect()
    from argodb_mapreduce_spark.operators.similarity import PQ_QUERIES, PQ_TOPK

    assert len(rows) == PQ_QUERIES
    assert all(0 <= r.hits_stale <= PQ_TOPK and 0 <= r.hits_retrained <= PQ_TOPK for r in rows)
    assert sum(r.hits_retrained for r in rows) > sum(r.hits_stale for r in rows)
    # recall columns are hits/k exactly
    assert all(abs(r.recall_stale - r.hits_stale / PQ_TOPK) < 1e-12 for r in rows)


def test_vacuum_reclaims_unreferenced_segments(spark, tmp_path):
    """VACUUM must delete exactly the segments no retained version
    references, keep retained versions readable, and leave the latest
    read identical; expired versions must raise on read."""
    import os as _os

    import pytest as _pytest

    from argodb_mapreduce_spark.sources.versioned import (
        snapshot_read,
        vacuum,
        versioned_write,
        versions,
    )

    path = str(tmp_path / "vac")
    versioned_write(spark.range(10).withColumnRenamed("id", "k"), path, "append")   # v0: data-0
    versioned_write(spark.range(10, 15).withColumnRenamed("id", "k"), path, "append")  # v1
    versioned_write(spark.range(50, 53).withColumnRenamed("id", "k"), path, "overwrite")  # v2: data-2
    versioned_write(spark.range(90, 92).withColumnRenamed("id", "k"), path, "append")  # v3: data-2,3
    before = sorted(r.k for r in snapshot_read(spark, path).collect())
    summary = vacuum(path, keep_versions=2)
    assert summary["versions_removed"] == 2 and summary["versions_kept"] == 2
    assert summary["segments_deleted"] == ["data-0", "data-1"]
    assert summary["bytes_reclaimed"] > 0
    assert not _os.path.exists(_os.path.join(path, "data-0"))
    assert _os.path.exists(_os.path.join(path, "data-2"))
    assert versions(path) == [2, 3]
    # retained versions read fine; latest identical
    assert sorted(r.k for r in snapshot_read(spark, path).collect()) == before
    assert snapshot_read(spark, path, 2).count() == 3
    # expired version now raises
    with _pytest.raises(ValueError, match="unknown version"):
        snapshot_read(spark, path, 0)
    # degenerate retention rejected
    with _pytest.raises(ValueError, match="keep_versions"):
        vacuum(path, keep_versions=0)


def test_pyds_writer_records_manifest_stats(spark, tmp_path):
    """The Python DataSource Arrow writer must publish the same
    stats-bearing manifest entries versioned_write does, so its
    segments participate in data skipping."""
    from argodb_mapreduce_spark.sources.python_datasource import register_datasource
    from argodb_mapreduce_spark.sources.versioned import _read_manifest, prune_segments

    register_datasource(spark)
    path = str(tmp_path / "pyds")
    df = spark.range(100).withColumnRenamed("id", "k")
    df.write.format("argodb_versioned").option("path", path).mode("append").save()
    entry = _read_manifest(path)[-1]
    assert entry["stats"][entry["segments"][0]]["k"] == [0, 99]
    kept, everything = prune_segments(path, predicates=[("k", ">=", 1000)])
    assert kept == [] and everything == entry["segments"]


# ---------------------------------------------------------------------------
# Property: pruning is ALWAYS a pure optimization (hypothesis)
# ---------------------------------------------------------------------------


def test_pruning_never_changes_results_property(spark, tmp_path):
    """For arbitrary predicate sets over a multi-segment table, the
    pruned read must equal the unpruned filtered read — the safety
    property that makes manifest stats a pure optimization. Driven by
    hypothesis over ops, literals, and predicate counts."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from argodb_mapreduce_spark.sources.versioned import (
        prune_segments,
        snapshot_read,
        versioned_write,
    )

    path = str(tmp_path / "prop")
    # 4 segments with overlapping, gapped, and single-value ranges
    for lo, hi in ((0, 25), (20, 40), (100, 101), (60, 90)):
        versioned_write(
            spark.range(lo, hi).withColumnRenamed("id", "k"), path, "append"
        )
    full = snapshot_read(spark, path)
    all_rows = sorted(r.k for r in full.collect())

    pred = st.tuples(
        st.just("k"),
        st.sampled_from(["<", "<=", ">", ">=", "="]),
        st.integers(min_value=-5, max_value=110),
    )

    @settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
    @given(preds=st.lists(pred, min_size=1, max_size=3))
    def check(preds):
        got = sorted(r.k for r in snapshot_read(spark, path, predicates=preds).collect())
        ops = {"<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
               ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
               "=": lambda a, b: a == b}
        want = [k for k in all_rows if all(ops[op](k, lit) for _c, op, lit in preds)]
        assert got == want, (preds, got[:5], want[:5])
        kept, everything = prune_segments(path, predicates=preds)
        assert set(kept) <= set(everything)

    check()


def test_bpe_encode_broadcasts_vocab_map(spark):
    """The corpus-sized token table must never shuffle for the vocab
    join: the encoded vocabulary map is broadcast."""
    from argodb_mapreduce_spark.operators.training_data import bpe_encode_documents
    from argodb_mapreduce_spark.plans.checks import explain_str

    s = explain_str(bpe_encode_documents(spark, SF), "simple")
    assert "BroadcastHashJoin" in s


def test_hybrid_rrf_ranks_and_fusion_semantics(spark):
    """RRF invariants: ranks are 1..k and dense, a doc present in both
    rankers outscores the same ranks singly, and the output is exactly
    HYBRID_TOPK rows ordered by (rrf desc, doc_id)."""
    from argodb_mapreduce_spark.operators.retrieval import (
        HYBRID_TOPK,
        RRF_K,
        retrieval_hybrid_rrf,
    )

    rows = retrieval_hybrid_rrf(spark, SF).collect()
    assert len(rows) == HYBRID_TOPK
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r.lex_rank is not None or r.vec_rank is not None
        expected = (1.0 / (RRF_K + r.lex_rank) if r.lex_rank else 0.0) + (
            1.0 / (RRF_K + r.vec_rank) if r.vec_rank else 0.0
        )
        assert abs(r.rrf_score - expected) < 1e-15


def test_compact_and_rollback_preserve_stats(spark, tmp_path):
    """Manifest stats must survive the whole lifecycle: compaction
    records fresh stats for its rewritten segment, and rollback restores
    the target version's stats with its segment list — neither silently
    disables data skipping."""
    from argodb_mapreduce_spark.sources.versioned import (
        _read_manifest,
        compact,
        prune_segments,
        rollback,
        versioned_write,
    )

    path = str(tmp_path / "life")
    versioned_write(spark.range(0, 10).withColumnRenamed("id", "k"), path, "append")
    versioned_write(spark.range(100, 110).withColumnRenamed("id", "k"), path, "append")
    compact(spark, path)  # v2: one rewritten segment
    entry = _read_manifest(path)[-1]
    seg = entry["segments"][0]
    assert entry["stats"][seg]["k"] == [0, 109]
    # pruning works on the compacted version
    kept, _ = prune_segments(path, predicates=[("k", ">=", 1000)])
    assert kept == []
    rollback(path, 1)  # v3 restores v1's two segments
    entry = _read_manifest(path)[-1]
    assert set(entry["stats"]) == set(entry["segments"])
    kept, everything = prune_segments(path, predicates=[("k", ">=", 100)])
    assert len(everything) == 2 and kept == [everything[1]]
