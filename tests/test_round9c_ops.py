"""Round-9c lifecycle tests: UPDATE ... WHERE (copy-on-write) and
SHALLOW CLONE (zero-copy fork) on the versioned store.

Registry-level value correctness is covered by the oracle twins
(`snapshot_update_where`, `snapshot_clone`); these tests pin the
lifecycle contracts the oracle cannot see: time travel across an
UPDATE, pruning counts, no-op/fail-loud paths, OCC, and the
vacuum-never-deletes-borrowed-segments clone guarantee.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from argodb_mapreduce_spark.catalog import load_table
from argodb_mapreduce_spark.sources.versioned import (
    ConcurrentWriteError,
    _read_manifest,
    clone_table,
    delete_where,
    snapshot_read,
    update_where,
    vacuum,
    versioned_write,
    versions,
)


def _two_segment_table(spark, sf_dir, path):
    o = load_table(spark, sf_dir, "orders")
    versioned_write(o.filter(F.col("o_orderkey") % 2 == 0), path, mode="append")
    versioned_write(o.filter(F.col("o_orderkey") % 2 == 1), path, mode="append")
    return o


# ---------------------------------------------------------------------------
# UPDATE ... WHERE
# ---------------------------------------------------------------------------


def test_update_time_travel_preserves_pre_update_rows(spark, sf_dir, tmp_path):
    out = str(tmp_path / "upd_tt")
    o = _two_segment_table(spark, sf_dir, out)
    before = snapshot_read(spark, out).agg(F.sum("o_totalprice")).first()[0]
    summary = update_where(
        spark,
        out,
        [("o_orderstatus", "=", "F")],
        {"o_totalprice": F.col("o_totalprice") * 2},
    )
    assert summary["rows_updated"] > 0
    # Pre-update version is bit-unchanged; head reflects the SET.
    pre = snapshot_read(spark, out, summary["version"] - 1)
    assert pre.agg(F.sum("o_totalprice")).first()[0] == before
    head = snapshot_read(spark, out)
    assert head.count() == o.count()
    delta = head.agg(F.sum("o_totalprice")).first()[0] - before
    expected = (
        o.filter(F.col("o_orderstatus") == "F").agg(F.sum("o_totalprice")).first()[0]
    )
    assert abs(delta - expected) < 1e-6 * max(abs(expected), 1.0)


def test_update_prunes_unmatched_segments(spark, sf_dir, tmp_path):
    """Segments whose min/max exclude the predicate carry forward by
    name — only matching segments rewrite."""
    out = str(tmp_path / "upd_prune")
    o = load_table(spark, sf_dir, "orders")
    versioned_write(o.filter(F.col("o_orderkey") < 1000), out, mode="append")
    versioned_write(o.filter(F.col("o_orderkey") >= 1000), out, mode="append")
    before_segs = _read_manifest(out)[-1]["segments"]
    summary = update_where(
        spark,
        out,
        [("o_orderkey", "<", 500)],
        {"o_orderpriority": F.lit("0-UPDATED")},
    )
    assert summary["segments_rewritten"] == 1
    assert summary["segments_total"] == 2
    after = _read_manifest(out)[-1]["segments"]
    assert before_segs[1] in after  # high-key segment carried forward
    assert before_segs[0] not in after  # low-key segment replaced


def test_update_noop_when_provably_unmatched(spark, sf_dir, tmp_path):
    """A predicate outside every segment's min/max commits NOTHING —
    no new version, no write."""
    out = str(tmp_path / "upd_noop")
    _two_segment_table(spark, sf_dir, out)
    head = versions(out)[-1]
    summary = update_where(
        spark,
        out,
        [("o_orderkey", "<", -1)],
        {"o_totalprice": F.lit(0.0)},
    )
    assert summary == {
        "version": head,
        "rows_updated": 0,
        "segments_rewritten": 0,
        "segments_total": 2,
    }
    assert versions(out)[-1] == head


def test_update_composes_with_pending_dv(spark, sf_dir, tmp_path):
    """r11: UPDATE on a DV-bearing table reads through the DV (deleted
    rows neither count as updated nor resurrect), materializes the
    tombstones in the rewrite, and the final state equals delete-then-
    update run on a DV-free twin."""
    out = str(tmp_path / "upd_dv")
    o = _two_segment_table(spark, sf_dir, out)
    _, n_deleted = delete_where(spark, out, [("o_orderstatus", "=", "F")])
    assert n_deleted > 0
    summary = update_where(
        spark, out, [("o_orderkey", ">", 0)], {"o_orderpriority": F.lit("0-X")}
    )
    live = o.filter(F.col("o_orderstatus") != "F")
    assert summary["rows_updated"] == live.count()  # deleted rows not counted
    final = snapshot_read(spark, out)
    assert final.count() == live.count()  # tombstones not resurrected
    assert final.filter(F.col("o_orderpriority") != "0-X").count() == 0
    assert final.filter(F.col("o_orderstatus") == "F").count() == 0


def test_update_occ_conflict_aborts(spark, sf_dir, tmp_path, monkeypatch):
    """A head moved between the UPDATE's read and its commit aborts the
    commit (no lost update) and cleans the staged segment."""
    import argodb_mapreduce_spark.sources.versioned as V

    out = str(tmp_path / "upd_occ")
    _two_segment_table(spark, sf_dir, out)
    real_commit = V._commit_entry

    def racing_commit(path, base_version, entry, cleanup_dirs=(), renames=None):
        # A concurrent metadata commit (e.g. another writer's manifest
        # append) lands just before our commit check.
        monkeypatch.setattr(V, "_commit_entry", real_commit)
        entries = V._read_manifest(path)
        entries.append({**entries[-1], "version": entries[-1]["version"] + 1})
        V._write_manifest(path, entries)
        return real_commit(path, base_version, entry, cleanup_dirs=cleanup_dirs, renames=renames)

    monkeypatch.setattr(V, "_commit_entry", racing_commit)
    with pytest.raises(ConcurrentWriteError):
        update_where(spark, out, [("o_orderkey", ">", 0)], {"o_orderpriority": F.lit("0-X")})
    # The staged rewrite segment was removed; the table head is the
    # concurrent append, readable and consistent.
    head_segs = _read_manifest(out)[-1]["segments"]
    on_disk = {d for d in os.listdir(out) if d.startswith("data-")}
    assert on_disk == set(head_segs)


# ---------------------------------------------------------------------------
# SHALLOW CLONE
# ---------------------------------------------------------------------------


def test_clone_is_zero_copy_and_pinned(spark, sf_dir, tmp_path):
    src = str(tmp_path / "clone_src")
    dst = str(tmp_path / "clone_dst")
    o = _two_segment_table(spark, sf_dir, src)
    clone_table(src, dst)
    # Zero-copy: no data directory inside the clone.
    assert not any(d.startswith("data-") for d in os.listdir(dst))
    assert snapshot_read(spark, dst).count() == o.count()
    # Pinned: a later SOURCE append is invisible to the clone.
    versioned_write(o.limit(10), src, mode="append")
    assert snapshot_read(spark, dst).count() == o.count()
    # Divergence: a CLONE append is invisible to the source.
    versioned_write(o.limit(5), dst, mode="append")
    assert snapshot_read(spark, dst).count() == o.count() + 5
    assert snapshot_read(spark, src).count() == o.count() + 10


def test_clone_at_pinned_version(spark, sf_dir, tmp_path):
    src = str(tmp_path / "clone_v_src")
    dst = str(tmp_path / "clone_v_dst")
    o = _two_segment_table(spark, sf_dir, src)
    clone_table(src, dst, version=0)
    assert snapshot_read(spark, dst).count() == o.filter(F.col("o_orderkey") % 2 == 0).count()


def test_clone_vacuum_never_deletes_borrowed_segments(spark, sf_dir, tmp_path):
    """vacuum on a clone may expire clone versions but must leave the
    source's segment bytes on disk (Delta CLONE contract)."""
    src = str(tmp_path / "clone_vac_src")
    dst = str(tmp_path / "clone_vac_dst")
    o = _two_segment_table(spark, sf_dir, src)
    clone_table(src, dst)
    # Two clone-local overwrites push the borrowed v0 out of retention.
    versioned_write(o.limit(3), dst, mode="overwrite")
    versioned_write(o.limit(3), dst, mode="overwrite")
    summary = vacuum(dst, keep_versions=1)
    assert summary["versions_removed"] == 2
    # Borrowed absolute segments were dropped from the manifest but
    # their bytes survive; the source still reads perfectly.
    assert all(not os.path.isabs(s) for s in summary["segments_deleted"])
    assert snapshot_read(spark, src).count() == o.count()


def test_clone_carries_stats_for_data_skipping(spark, sf_dir, tmp_path):
    """The clone inherits the source's manifest min/max, so pruned
    reads work without touching the source manifest."""
    from argodb_mapreduce_spark.sources.versioned import prune_segments

    src = str(tmp_path / "clone_stats_src")
    dst = str(tmp_path / "clone_stats_dst")
    o = load_table(spark, sf_dir, "orders")
    versioned_write(o.filter(F.col("o_orderkey") < 1000), src, mode="append")
    versioned_write(o.filter(F.col("o_orderkey") >= 1000), src, mode="append")
    clone_table(src, dst)
    kept, everything = prune_segments(dst, 0, [("o_orderkey", "<", 500)])
    assert len(everything) == 2 and len(kept) == 1


def test_clone_refuses_existing_manifest(spark, sf_dir, tmp_path):
    src = str(tmp_path / "clone_dup_src")
    dst = str(tmp_path / "clone_dup_dst")
    _two_segment_table(spark, sf_dir, src)
    clone_table(src, dst)
    with pytest.raises(ValueError, match="already has a manifest"):
        clone_table(src, dst)


def test_clone_carries_deletion_vector(spark, sf_dir, tmp_path):
    """A pending DV clones by absolute reference: the clone's
    merge-on-read scan hides the same rows."""
    src = str(tmp_path / "clone_dv_src")
    dst = str(tmp_path / "clone_dv_dst")
    o = _two_segment_table(spark, sf_dir, src)
    _, n_del = delete_where(spark, src, [("o_orderstatus", "=", "F")])
    clone_table(src, dst)
    assert snapshot_read(spark, dst).count() == o.count() - n_del


# ---------------------------------------------------------------------------
# Round-9c query ops: URL canonicalization dedup, approx percentile
# ---------------------------------------------------------------------------


def test_url_canonical_plan_is_one_shuffle(spark, sf_dir):
    """Canonicalization must be map-side codegen; the only exchange is
    the canonical-key groupBy (partial agg before it)."""
    from argodb_mapreduce_spark.operators.dedup import dedup_url_canonical
    from argodb_mapreduce_spark.plans.checks import explain_str

    plan = explain_str(dedup_url_canonical(spark, sf_dir), "simple")
    assert plan.count("Exchange") == 2 and "Join" not in plan
    # Column pruning: the scan must read only the two source columns
    # (canonicalization is a projection, never a full-row read).
    formatted = explain_str(dedup_url_canonical(spark, sf_dir), "formatted")
    assert "ReadSchema: struct<doc_id:bigint,source:string>" in formatted


def test_url_canonical_collapses_spelling_noise(spark, sf_dir):
    """Every canonical group with >1 fetch must have collapsed at least
    one DISTINCT raw spelling pair, and no canonical url keeps scheme,
    www., query, fragment, or trailing slash."""
    from argodb_mapreduce_spark.operators.dedup import dedup_url_canonical

    rows = dedup_url_canonical(spark, sf_dir).collect()
    assert rows
    for r in rows:
        u = r.canonical_url
        assert not u.startswith(("http://", "https://", "www."))
        assert "?" not in u and "#" not in u and not u.endswith("/")
        assert u == u.lower()
        assert r.n_spellings <= r.n_fetches
    assert any(r.n_spellings > 1 for r in rows)  # noise actually collapsed


def test_approx_percentile_within_tolerance(spark, sf_dir):
    from argodb_mapreduce_spark.operators.relational import agg_approx_percentile

    rows = agg_approx_percentile(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.approx_within_1pct, r
        assert r.p50_exact <= r.p95_exact


def test_weighted_reservoir_favors_heavy_rows(spark, sf_dir):
    """A-ES with w = o_totalprice must overrepresent expensive orders:
    the sampled mean price exceeds the corpus mean in every group."""
    from argodb_mapreduce_spark.operators.sampling import (
        RESERVOIR_K,
        sample_weighted_reservoir,
    )

    sampled = sample_weighted_reservoir(spark, sf_dir)
    per_group = {
        r.o_orderpriority: r.m
        for r in sampled.groupBy("o_orderpriority").agg(
            F.avg("o_totalprice").alias("m"), F.count(F.lit(1)).alias("n")
        ).collect()
    }
    corpus = {
        r.o_orderpriority: r.m
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.avg("o_totalprice").alias("m"))
        .collect()
    }
    assert per_group.keys() == corpus.keys()
    heavier = sum(per_group[g] > corpus[g] for g in corpus)
    # k=5 draws are noisy; demand a clear majority of groups lean heavy.
    assert heavier >= len(corpus) - 1, (per_group, corpus)
    counts = sampled.groupBy("o_orderpriority").count().collect()
    assert all(r["count"] == RESERVOIR_K for r in counts)


def test_weighted_reservoir_plan_uses_group_limit(spark, sf_dir):
    """The rank<=k filter must push into the window as a per-partition
    group limit — the property that bounds state to k rows per group
    per partition on a big scan."""
    from argodb_mapreduce_spark.operators.sampling import sample_weighted_reservoir
    from argodb_mapreduce_spark.plans.checks import explain_str

    plan = explain_str(sample_weighted_reservoir(spark, sf_dir), "simple")
    assert "WindowGroupLimit" in plan


# ---------------------------------------------------------------------------
# CHECK constraints
# ---------------------------------------------------------------------------


def test_add_constraint_validates_existing_data(spark, sf_dir, tmp_path):
    from argodb_mapreduce_spark.sources.versioned import (
        ConstraintViolation,
        add_constraint,
    )

    out = str(tmp_path / "con_existing")
    _two_segment_table(spark, sf_dir, out)
    with pytest.raises(ConstraintViolation, match="existing rows violate"):
        add_constraint(spark, out, "impossible", "o_totalprice < 0")
    # A satisfiable constraint registers and duplicate names are refused.
    assert add_constraint(spark, out, "price_positive", "o_totalprice > 0") == 1
    with pytest.raises(ValueError, match="already exists"):
        add_constraint(spark, out, "price_positive", "o_totalprice > 1")


def test_constraint_null_counts_as_violation(spark, sf_dir, tmp_path):
    from argodb_mapreduce_spark.sources.versioned import (
        ConstraintViolation,
        add_constraint,
    )

    out = str(tmp_path / "con_null")
    o = _two_segment_table(spark, sf_dir, out)
    add_constraint(spark, out, "status_known", "o_orderstatus IN ('F','O','P')")
    nulled = o.limit(3).withColumn("o_orderstatus", F.lit(None).cast("string"))
    with pytest.raises(ConstraintViolation, match="status_known"):
        versioned_write(nulled, out, mode="append")


def test_constraint_violating_write_leaves_no_artifacts(spark, sf_dir, tmp_path):
    from argodb_mapreduce_spark.sources.versioned import (
        ConstraintViolation,
        add_constraint,
    )

    out = str(tmp_path / "con_clean")
    o = _two_segment_table(spark, sf_dir, out)
    add_constraint(spark, out, "price_positive", "o_totalprice > 0")
    head = versions(out)[-1]
    before = set(os.listdir(out))
    bad = o.limit(5).withColumn("o_totalprice", F.lit(-1.0))
    with pytest.raises(ConstraintViolation):
        versioned_write(bad, out, mode="append")
    assert versions(out)[-1] == head
    assert set(os.listdir(out)) == before  # no staged dir, no segment


def test_clone_inherits_constraints(spark, sf_dir, tmp_path):
    from argodb_mapreduce_spark.sources.versioned import (
        ConstraintViolation,
        add_constraint,
    )

    src = str(tmp_path / "con_clone_src")
    dst = str(tmp_path / "con_clone_dst")
    o = _two_segment_table(spark, sf_dir, src)
    add_constraint(spark, src, "price_positive", "o_totalprice > 0")
    clone_table(src, dst)
    bad = o.limit(5).withColumn("o_totalprice", F.lit(-1.0))
    with pytest.raises(ConstraintViolation):
        versioned_write(bad, dst, mode="append")
    # Valid writes still flow into the clone.
    versioned_write(o.limit(5), dst, mode="append")
    assert snapshot_read(spark, dst).count() == o.count() + 5


# ---------------------------------------------------------------------------
# Bin-packing OPTIMIZE
# ---------------------------------------------------------------------------


def test_binpack_carries_large_and_merges_small(spark, sf_dir, tmp_path):
    from argodb_mapreduce_spark.sources.versioned import (
        _segment_bytes,
        compact_binpack,
    )

    out = str(tmp_path / "binpack")
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey") % 100
    versioned_write(o.filter(k >= 4), out)  # large
    for i in range(4):
        versioned_write(o.filter(k == i), out)  # 4 slivers
    segs = _read_manifest(out)[-1]["segments"]
    target = sum(_segment_bytes(out, s) for s in segs[1:]) + 1
    summary = compact_binpack(spark, out, target)
    assert summary["segments_before"] == 5
    assert summary["segments_after"] == 2
    assert summary["bins_rewritten"] == 1
    head = _read_manifest(out)[-1]["segments"]
    assert segs[0] in head  # large carried by name
    assert snapshot_read(spark, out).count() == o.count()
    # Pre-pack version still time-travels with all 5 segments.
    assert snapshot_read(spark, out, summary["version"] - 1).count() == o.count()


def test_binpack_noop_when_nothing_to_pack(spark, sf_dir, tmp_path):
    """All-large segments (target below every size) and a single small
    segment (bin of one) both commit NOTHING."""
    from argodb_mapreduce_spark.sources.versioned import compact_binpack

    out = str(tmp_path / "binpack_noop")
    o = _two_segment_table(spark, sf_dir, out)
    head = versions(out)[-1]
    assert compact_binpack(spark, out, 1)["bins_rewritten"] == 0  # all large
    big = 10**12
    # Two segments fit one bin -> they DO pack; use a fresh table with
    # one small + one large instead to exercise the singleton-bin path.
    out2 = str(tmp_path / "binpack_single")
    versioned_write(o.filter(F.col("o_orderkey") % 100 == 0), out2)
    s = compact_binpack(spark, out2, big)
    assert s["bins_rewritten"] == 0 and versions(out2)[-1] == 0
    assert versions(out)[-1] == head


def test_binpack_composes_with_pending_dv(spark, sf_dir, tmp_path):
    """r11: bin-packing a DV-bearing table materializes the tombstones
    in the packed bins; a fully-packed table drops the DV."""
    from argodb_mapreduce_spark.sources.versioned import (
        _read_manifest,
        compact_binpack,
    )

    out = str(tmp_path / "binpack_dv")
    o = _two_segment_table(spark, sf_dir, out)
    delete_where(spark, out, [("o_orderstatus", "=", "F")])
    before = snapshot_read(spark, out)
    n_live = before.count()
    summary = compact_binpack(spark, out, 10**12)
    assert summary["bins_rewritten"] == 1  # both segments packed
    entry = _read_manifest(out)[-1]
    assert "dv" not in entry  # fully materialized
    after = snapshot_read(spark, out)
    assert after.count() == n_live == o.filter(F.col("o_orderstatus") != "F").count()
    assert after.exceptAll(before).count() == 0


def test_binpack_preserves_data_skipping(spark, sf_dir, tmp_path):
    """Packed segments get fresh stats: a range predicate still prunes."""
    from argodb_mapreduce_spark.sources.versioned import (
        compact_binpack,
        prune_segments,
    )

    from argodb_mapreduce_spark.sources.versioned import _segment_bytes

    out = str(tmp_path / "binpack_stats")
    o = load_table(spark, sf_dir, "orders")
    lo = o.agg(F.min("o_orderkey")).first()[0]
    c1, c2 = lo + 150, lo + 300  # two 150-key slivers, the rest large
    versioned_write(o.filter(F.col("o_orderkey") >= c2), out)  # large, high keys
    versioned_write(o.filter(F.col("o_orderkey") < c1), out)
    versioned_write(
        o.filter((F.col("o_orderkey") >= c1) & (F.col("o_orderkey") < c2)), out
    )
    segs = _read_manifest(out)[-1]["segments"]
    target = sum(_segment_bytes(out, s) for s in segs[1:]) + 1
    assert _segment_bytes(out, segs[0]) >= target
    summary = compact_binpack(spark, out, target)
    assert summary["bins_rewritten"] == 1  # both small low-key segments
    # The packed low-key segment carries fresh min/max: a low-key probe
    # prunes the untouched large segment, keeping only the packed one.
    kept, everything = prune_segments(
        out, summary["version"], [("o_orderkey", "<", lo + 100)]
    )
    assert len(everything) == 2 and len(kept) == 1
    assert kept[0] not in segs  # the survivor IS the newly packed segment


# ---------------------------------------------------------------------------
# AS OF TIMESTAMP
# ---------------------------------------------------------------------------


def test_as_of_timestamp_resolution(spark, sf_dir, tmp_path):
    from argodb_mapreduce_spark.sources.versioned import (
        snapshot_read as sread,
        version_at_timestamp,
    )

    out = str(tmp_path / "ts_travel")
    o = _two_segment_table(spark, sf_dir, out)
    ts = {e["version"]: e["ts"] for e in _read_manifest(out)}
    assert version_at_timestamp(out, ts[0]) == 0
    assert version_at_timestamp(out, (ts[0] + ts[1]) / 2) == 0  # older wins
    assert version_at_timestamp(out, ts[1]) == 1
    assert version_at_timestamp(out, ts[1] + 10) == 1  # future ts -> head
    with pytest.raises(ValueError, match="no version committed"):
        version_at_timestamp(out, ts[0] - 1)
    with pytest.raises(ValueError, match="not both"):
        sread(spark, out, version=0, as_of_ts=ts[0])
    assert sread(spark, out, as_of_ts=ts[0]).count() == sread(spark, out, 0).count()
    assert sread(spark, out, as_of_ts=ts[1] + 10).count() == o.count()


def test_every_write_path_stamps_ts(spark, sf_dir, tmp_path):
    """append, DELETE (DV), MERGE, UPDATE, compact, rollback, binpack —
    each commit must carry a monotonically nondecreasing ts."""
    from argodb_mapreduce_spark.sources.versioned import (
        compact,
        compact_binpack,
        merge_upsert,
        rollback,
        update_where,
    )

    out = str(tmp_path / "ts_paths")
    o = _two_segment_table(spark, sf_dir, out)
    delete_where(spark, out, [("o_orderstatus", "=", "F")])
    compact(spark, out)
    merge_upsert(spark, out, o.limit(10), "o_orderkey")
    update_where(spark, out, [("o_orderkey", ">", 0)], {"o_totalprice": F.col("o_totalprice")})
    rollback(out, 0)
    compact_binpack(spark, out, 10**12)
    stamps = [e.get("ts") for e in _read_manifest(out)]
    assert all(t is not None for t in stamps), stamps
    assert stamps == sorted(stamps)


def test_update_on_schema_evolved_table(spark, sf_dir, tmp_path):
    """UPDATE over a table whose segments have divergent schemas reads
    with mergeSchema: the old segment's missing column NULL-backfills
    and the SET still applies."""
    out = str(tmp_path / "upd_evolved")
    o = load_table(spark, sf_dir, "orders")
    versioned_write(o.filter(F.col("o_orderkey") % 2 == 0), out)
    versioned_write(
        o.filter(F.col("o_orderkey") % 2 == 1).withColumn("region_tag", F.lit("emea")),
        out,
    )
    summary = update_where(
        spark,
        out,
        [("o_orderkey", ">", 0)],
        {"o_orderpriority": F.lit("0-EVOLVED")},
    )
    assert summary["segments_rewritten"] == 2
    head = snapshot_read(spark, out)
    assert head.count() == o.count()
    # o_orderkey == 0 (if present) fails the > 0 predicate and keeps
    # its original priority; every other row got the SET.
    untouched = head.filter(F.col("o_orderpriority") != "0-EVOLVED").count()
    assert untouched == o.filter(F.col("o_orderkey") <= 0).count()
    # Evolved column survives the rewrite with NULL backfill on old rows.
    assert "region_tag" in head.columns
    nulls = head.filter(F.col("region_tag").isNull()).count()
    assert nulls == o.filter(F.col("o_orderkey") % 2 == 0).count()


def test_merge_on_schema_evolved_table(spark, sf_dir, tmp_path):
    """MERGE over a schema-evolved table NULL-backfills the evolved
    column for untouched-source rows instead of dropping it; a
    mis-shaped source on a UNIFORM table still fails loud."""
    from argodb_mapreduce_spark.sources.versioned import merge_upsert

    out = str(tmp_path / "merge_evolved")
    o = load_table(spark, sf_dir, "orders")
    versioned_write(o.filter(F.col("o_orderkey") % 2 == 0), out)
    versioned_write(
        o.filter(F.col("o_orderkey") % 2 == 1).withColumn("region_tag", F.lit("emea")),
        out,
    )
    source = o.limit(10).withColumn("o_totalprice", F.col("o_totalprice") * 2)
    merge_upsert(spark, out, source, "o_orderkey")
    head = snapshot_read(spark, out)
    assert head.count() == o.count()
    assert "region_tag" in head.columns
    # Uniform table + source with a missing column -> loud failure.
    out2 = str(tmp_path / "merge_uniform")
    versioned_write(o, out2)
    bad = o.limit(3).drop("o_orderpriority")
    with pytest.raises(Exception, match="o_orderpriority|UNION|column"):
        merge_upsert(spark, out2, bad, "o_orderkey")


# ---------------------------------------------------------------------------
# MV query rewrite
# ---------------------------------------------------------------------------


def test_mv_answer_freshness_gate_and_key_validation(spark, sf_dir, tmp_path):
    from argodb_mapreduce_spark.operators.materialized_view import (
        StaleMaterializedView,
        mv_answer,
        mv_create,
        mv_refresh,
    )

    base = str(tmp_path / "mvqr_base")
    mv = str(tmp_path / "mvqr_mv")
    o = load_table(spark, sf_dir, "orders")
    versioned_write(o.filter(F.col("o_orderkey") % 2 == 0), base)
    mv_create(spark, base, mv, ["o_orderpriority"], ["o_orderkey"])
    # Fresh: exact-key answer equals a direct aggregate.
    ans = {r.o_orderpriority: r.n_rows for r in mv_answer(spark, mv, ["o_orderpriority"]).collect()}
    direct = {
        r.o_orderpriority: r.n
        for r in snapshot_read(spark, base)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert ans == direct
    # A non-subset key set is refused.
    with pytest.raises(ValueError, match="cannot answer"):
        mv_answer(spark, mv, ["o_orderstatus"])
    # Base advances -> answering raises until refresh.
    versioned_write(o.filter(F.col("o_orderkey") % 2 == 1), base)
    with pytest.raises(StaleMaterializedView):
        mv_answer(spark, mv, ["o_orderpriority"])
    mv_refresh(spark, mv)
    total = mv_answer(spark, mv, []).first()
    assert total.n_rows == o.count()


# ---------------------------------------------------------------------------
# Review-pass fixes (round 9d)
# ---------------------------------------------------------------------------


def test_merge_on_clone_rewrites_borrowed_segments(spark, sf_dir, tmp_path):
    """MERGE on a shallow clone must classify borrowed absolute-path
    segments as touched and rewrite them — not duplicate matched keys."""
    from argodb_mapreduce_spark.sources.versioned import merge_upsert

    src = str(tmp_path / "mc_src")
    dst = str(tmp_path / "mc_dst")
    o = _two_segment_table(spark, sf_dir, src)
    clone_table(src, dst)
    source = o.limit(20).withColumn("o_totalprice", F.col("o_totalprice") * 2)
    summary = merge_upsert(spark, dst, source, "o_orderkey")
    assert summary["segments_rewritten"] >= 1
    head = snapshot_read(spark, dst)
    assert head.count() == o.count()  # upsert of existing keys: no growth
    dup = head.groupBy("o_orderkey").count().filter(F.col("count") > 1).count()
    assert dup == 0
    # Source stays untouched.
    assert snapshot_read(spark, src).count() == o.count()


def test_delete_preserves_schema_ledger_and_enforcement(spark, sf_dir, tmp_path):
    """DELETE keeps the schemas ledger: evolved reads still NULL-backfill
    and a type-conflicting append is still refused afterwards."""
    out = str(tmp_path / "del_ledger")
    o = load_table(spark, sf_dir, "orders")
    versioned_write(o.filter(F.col("o_orderkey") % 2 == 0), out)
    versioned_write(
        o.filter(F.col("o_orderkey") % 2 == 1).withColumn("region_tag", F.lit("x")), out
    )
    delete_where(spark, out, [("o_orderstatus", "=", "F")])
    head = snapshot_read(spark, out)
    assert "region_tag" in head.columns  # mergeSchema gate survived
    bad = o.limit(3).withColumn("o_totalprice", F.lit("strung"))
    with pytest.raises(ValueError, match="schema enforcement"):
        versioned_write(bad, out, mode="append")


def test_rollback_and_compact_preserve_schema_ledger(spark, sf_dir, tmp_path):
    from argodb_mapreduce_spark.sources.versioned import compact, rollback

    out = str(tmp_path / "rb_ledger")
    o = load_table(spark, sf_dir, "orders")
    versioned_write(o.filter(F.col("o_orderkey") % 2 == 0), out)
    versioned_write(
        o.filter(F.col("o_orderkey") % 2 == 1).withColumn("region_tag", F.lit("x")), out
    )
    rollback(out, 1)
    assert _read_manifest(out)[-1].get("schemas"), "rollback dropped the ledger"
    assert "region_tag" in snapshot_read(spark, out).columns
    compact(spark, out)
    assert _read_manifest(out)[-1].get("schemas"), "compact dropped the ledger"
    bad = o.limit(3).withColumn("o_totalprice", F.lit("strung"))
    with pytest.raises(ValueError, match="schema enforcement"):
        versioned_write(bad, out, mode="append")


def test_bloom_null_safe_and_type_guarded(spark, sf_dir, tmp_path):
    from argodb_mapreduce_spark.sources.versioned import prune_segments

    out = str(tmp_path / "bloom_null")
    o = load_table(spark, sf_dir, "orders").limit(200)
    with_nulls = o.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(F.col("o_custkey")),
    )
    versioned_write(with_nulls, out, bloom_columns=("o_custkey",))  # must not crash
    some_key = with_nulls.filter(F.col("o_custkey").isNotNull()).first().o_custkey
    kept, _ = prune_segments(out, 0, [("o_custkey", "=", int(some_key))])
    assert kept  # present value never pruned
    with pytest.raises(ValueError, match="unsupported"):
        versioned_write(
            o.limit(5), str(tmp_path / "bloom_double"), bloom_columns=("o_totalprice",)
        )


def test_txn_stamp_is_atomic_with_the_data_commit(spark, sf_dir, tmp_path):
    from argodb_mapreduce_spark.sources.versioned import versioned_write_txn

    out = str(tmp_path / "txn_atomic")
    o = load_table(spark, sf_dir, "orders").limit(10)
    v, committed = versioned_write_txn(o, out, "app", 0)
    assert committed
    entry = _read_manifest(out)[-1]
    # One manifest entry, already stamped: no second write ever happened.
    assert entry["txn"] == {"app_id": "app", "batch_id": 0}
    assert entry.get("ts") is not None
    # Replay refused.
    assert versioned_write_txn(o, out, "app", 0) == (v, False)


def test_change_feed_spans_schema_evolution(spark, sf_dir, tmp_path):
    from argodb_mapreduce_spark.sources.versioned import change_feed

    out = str(tmp_path / "cf_evolved")
    o = load_table(spark, sf_dir, "orders")
    versioned_write(o.filter(F.col("o_orderkey") % 2 == 0), out)
    versioned_write(
        o.filter(F.col("o_orderkey") % 2 == 1).withColumn("region_tag", F.lit("x")), out
    )
    feed = change_feed(spark, out, 0, 1)
    assert feed.count() == o.filter(F.col("o_orderkey") % 2 == 1).count()
    assert "region_tag" in feed.columns


def test_fully_pruned_read_keeps_evolved_schema(spark, sf_dir, tmp_path):
    out = str(tmp_path / "pruned_evolved")
    o = load_table(spark, sf_dir, "orders")
    versioned_write(o.filter(F.col("o_orderkey") < 500), out)
    versioned_write(
        o.filter(F.col("o_orderkey") >= 500).withColumn("region_tag", F.lit("x")), out
    )
    # Predicate prunes EVERY segment; the empty result must still carry
    # the evolved column so residual filters on it resolve.
    df = snapshot_read(spark, out, predicates=[("o_orderkey", "<", -5)])
    assert df.count() == 0
    assert "region_tag" in df.columns


def test_merge_composes_with_pending_dv(spark, sf_dir, tmp_path):
    """r11: MERGE on a DV-bearing table — tombstoned rows neither match
    nor resurrect; the DV carries forward for untouched segments and a
    source key whose only target row was deleted becomes an INSERT."""
    from argodb_mapreduce_spark.sources.versioned import merge_upsert

    out = str(tmp_path / "merge_dv")
    o = _two_segment_table(spark, sf_dir, out)
    delete_where(spark, out, [("o_orderstatus", "=", "F")])
    live = o.filter(F.col("o_orderstatus") != "F")
    # source: update 50 live keys + re-upsert 10 DELETED keys
    upd = live.limit(50).withColumn("o_totalprice", F.lit(1.0))
    resurrect = (
        o.filter(F.col("o_orderstatus") == "F").limit(10)
        .withColumn("o_totalprice", F.lit(2.0))
    )
    src = upd.unionByName(resurrect)
    n_src = src.count()
    merge_upsert(spark, out, src, "o_orderkey")
    final = snapshot_read(spark, out)
    # live rows not in source carry; source rows land exactly once
    assert final.count() == live.count() - 50 + n_src
    assert final.filter(F.col("o_totalprice") == 1.0).count() == 50
    assert final.filter(F.col("o_totalprice") == 2.0).count() == 10
    # other deleted rows stay deleted
    assert (
        final.filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") != 2.0)).count()
        == 0
    )
