"""Round 14: superset-RESTORE masking in the streaming CDF planner.

Contract under test (ADVICE r13, medium): a rollback past a retention
delete onto a DV-carrying version re-ADDS segments with removed == ∅.
Two flavors, both previously divergent:

- DV carried BY NAME (pure retention drop, then rollback past it): the
  dv-delta branch sees no change, and the re-added segment's files fell
  through to the plain append block as WHOLE-FILE insert legs — rows
  tombstoned in the (unchanged) DV were re-inserted at the replica.
- DV name CHANGED (partial retention drop wrote a new sidecar): the
  synthesis branch did not fire (it keyed on removed segments only), so
  re-added files again emitted unmasked inserts while the dv-delta
  branch emitted the same positions as delete legs — with the
  deletes-first replay order the replica re-inserts dead rows.

The fix masks re-added files' insert legs with the CURRENT version's DV
(kind='add', matching the batch synthesizer) and triggers full
synthesis on superset restores whose DV changed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from argodb_mapreduce_spark.sources.versioned import (
    change_feed,
    delete_keys,
    delete_where,
    rollback,
    snapshot_read,
    versioned_write,
)
from tests.test_round13_ops import _drain, _legs, _stream_feed


def _two_segments(spark, tmp_path):
    """v0: segment A (k 0..59), v1: segment B (k 100..119)."""
    p = str(tmp_path / "t")
    for lo, hi in ((0, 60), (100, 120)):
        versioned_write(
            spark.range(lo, hi).select(
                F.col("id").alias("k"),
                (F.col("id") % 3).alias("g"),
                (F.col("id") * 10).cast("long").alias("v"),
            ),
            p,
            mode="append",
        )
    return p


def test_superset_restore_with_carried_dv_masks_readded_inserts(
    spark, tmp_path
):
    """Rollback past a PURE retention drop: the restore's DV is the
    same sidecar BY NAME, so only the insert-leg mask can keep the
    re-added segment's tombstoned rows out of the feed."""
    p = _two_segments(spark, tmp_path)
    delete_keys(
        spark,
        p,
        spark.createDataFrame([(0,), (10,), (100,), (110,)], "k long"),
        "k",
    )  # v2: dv deletes-2, tombstones in BOTH segments
    delete_where(spark, p, [("k", ">=", 100)])  # v3: metadata-drops B
    rollback(p, 2)  # v4: re-adds B; dv stays deletes-2 (carried by name)

    cells = _drain(
        spark,
        _stream_feed(spark, p, readChangeFeed="true"),
        "t14_superset_carried",
    )
    live_b = (18, sum(range(100, 120)) - 100 - 110)
    assert cells[("delete", 2)] == (4, 220)
    assert cells[("delete", 3)] == live_b  # drop legs: B's live rows
    # THE FIX: re-added B emits only its LIVE rows (mask = current DV),
    # not the whole files (20, 2190).
    assert cells[("insert", 4)] == live_b
    # Batch feed agrees over the same window.
    assert _legs(change_feed(spark, p, 3, 4)) == {"insert": live_b}
    # Replaying the feed converges on the head snapshot.
    assert snapshot_read(spark, p).count() == 60 + 20 - 4


def test_superset_restore_with_changed_dv_synthesizes_legs(spark, tmp_path):
    """Rollback past a PARTIAL retention drop (new DV name): the
    synthesis branch must fire on the superset diff — masked add legs
    for the re-added segment, revive legs for the shared segment's
    retracted tombstones, and NO unmasked duplicate inserts."""
    p = _two_segments(spark, tmp_path)
    delete_keys(
        spark,
        p,
        spark.createDataFrame([(100,), (110,)], "k long"),
        "k",
    )  # v2: dv deletes-2, tombstones only in B
    # v3: drops B outright AND tombstones A's k>=50 -> NEW dv deletes-3
    delete_where(spark, p, [("k", ">=", 50)])
    rollback(p, 2)  # v4: segments [A, B] again, dv deletes-2 != deletes-3

    cells = _drain(
        spark,
        _stream_feed(spark, p, readChangeFeed="true"),
        "t14_superset_changed",
    )
    live_b = (18, sum(range(100, 120)) - 100 - 110)
    revived_a = (10, sum(range(50, 60)))
    assert cells[("delete", 3)] == (
        live_b[0] + 10,
        live_b[1] + revived_a[1],
    )  # B's live rows dropped + A's k>=50 tombstoned
    assert cells[("insert", 4)] == (
        live_b[0] + revived_a[0],
        live_b[1] + revived_a[1],
    )  # masked add legs for B + revive legs for A
    assert ("delete", 4) not in cells  # no spurious delete legs
    # Batch feed agrees over the restore window.
    assert _legs(change_feed(spark, p, 3, 4)) == {
        "insert": (live_b[0] + revived_a[0], live_b[1] + revived_a[1])
    }
    assert snapshot_read(spark, p).count() == 60 + 20 - 2


def test_plain_append_after_delete_keeps_unmasked_insert_fast_path(
    spark, tmp_path
):
    """A NORMAL append onto a DV-carrying head must keep whole-file
    insert legs (fresh files can never appear in a pre-existing DV) —
    the mask is empty and the leg kind stays 'insert'."""
    p = _two_segments(spark, tmp_path)
    delete_keys(
        spark, p, spark.createDataFrame([(0,), (100,)], "k long"), "k"
    )  # v2
    versioned_write(
        spark.range(200, 205).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).alias("g"),
            (F.col("id") * 10).cast("long").alias("v"),
        ),
        p,
        mode="append",
    )  # v3
    cells = _drain(
        spark,
        _stream_feed(spark, p, readChangeFeed="true"),
        "t14_plain_append",
    )
    assert cells[("insert", 3)] == (5, sum(range(200, 205)))


# ---------------------------------------------------------------------------
# Encrypted-table DML (VERDICT r13 ask #1/#2 + key-fingerprint ADVICE)
# ---------------------------------------------------------------------------

import base64
import glob
import os

KEY = base64.b64encode(bytes(range(32))).decode()
WRONG = base64.b64encode(bytes(range(1, 33))).decode()


def _encrypted_table(spark, tmp_path, name="enc"):
    """Two encrypted pyds appends: k 0..99 (grp k%5) and k 100..149."""
    from argodb_mapreduce_spark.sources.python_datasource import (
        FORMAT_NAME,
        register_datasource,
    )

    register_datasource(spark)
    p = str(tmp_path / name)
    for lo, hi in ((0, 100), (100, 150)):
        (
            spark.range(lo, hi)
            .select(
                F.col("id").alias("k"),
                (F.col("id") % 5).alias("grp"),
                F.concat(F.lit("row-"), F.col("id")).alias("s"),
            )
            .write.format(FORMAT_NAME)
            .option("encryptionKey", KEY)
            .mode("append")
            .save(p)
        )
    return p


def test_keyed_snapshot_read_and_native_refusal(spark, tmp_path):
    p = _encrypted_table(spark, tmp_path)
    df = snapshot_read(spark, p, encryption_key=KEY)
    assert df.count() == 150
    assert df.agg(F.sum("k")).first()[0] == sum(range(150))
    with pytest.raises(ValueError, match="encrypt"):
        snapshot_read(spark, p)


def test_wrong_key_rejected_at_plan_by_fingerprint(spark, tmp_path):
    p = _encrypted_table(spark, tmp_path)
    with pytest.raises(ValueError, match="fingerprint"):
        snapshot_read(spark, p, encryption_key=WRONG)


def test_wrong_key_append_rejected(spark, tmp_path):
    from argodb_mapreduce_spark.sources.python_datasource import FORMAT_NAME

    p = _encrypted_table(spark, tmp_path)
    with pytest.raises(Exception, match="fingerprint"):
        (
            spark.range(150, 160)
            .select(
                F.col("id").alias("k"),
                (F.col("id") % 5).alias("grp"),
                F.lit("x").alias("s"),
            )
            .write.format(FORMAT_NAME)
            .option("encryptionKey", WRONG)
            .mode("append")
            .save(p)
        )


def test_delete_keys_on_encrypted_table(spark, tmp_path):
    p = _encrypted_table(spark, tmp_path)
    keys = spark.range(0, 30).select(F.col("id").alias("k"))
    _v, n = delete_keys(spark, p, keys, "k", encryption_key=KEY)
    assert n == 30
    df = snapshot_read(spark, p, encryption_key=KEY)
    assert df.count() == 120
    assert df.filter(F.col("k") < 30).count() == 0
    # the DV commit keeps the gates + fingerprint armed
    from argodb_mapreduce_spark.sources import manifest_log as ml
    from argodb_mapreduce_spark.sources.versioned import key_fingerprint

    head = ml.head_entry(p)
    assert head["encrypted"] and head["key_fp"] == key_fingerprint(KEY)


def test_delete_where_and_compact_reencrypt(spark, tmp_path):
    import pyarrow.parquet as pq

    from argodb_mapreduce_spark.sources import manifest_log as ml
    from argodb_mapreduce_spark.sources.versioned import compact

    p = _encrypted_table(spark, tmp_path)
    _v, n = delete_where(spark, p, [("grp", "=", 2)], encryption_key=KEY)
    assert n == 30
    compact(spark, p, flatten=True, encryption_key=KEY)
    head = ml.head_entry(p)
    assert head["encrypted"] and head.get("dv") is None
    # compacted bytes stay keyless-unreadable (fresh AES-GCM data keys)
    f = sorted(glob.glob(os.path.join(p, head["segments"][-1], "*.parquet")))[0]
    with pytest.raises(OSError):
        pq.ParquetFile(f).read()
    df = snapshot_read(spark, p, encryption_key=KEY)
    assert df.count() == 120
    assert df.filter(F.col("grp") == 2).count() == 0
    # erased keys physically left: no parquet file under the head
    # segment contains them even via keyed read of raw files
    assert df.agg(F.sum("k")).first()[0] == sum(
        k for k in range(150) if k % 5 != 2
    )


def test_change_feed_keyed_on_encrypted_table(spark, tmp_path):
    p = _encrypted_table(spark, tmp_path)
    delete_where(spark, p, [("grp", "=", 0)], encryption_key=KEY)
    with pytest.raises(ValueError, match="encrypt"):
        change_feed(spark, p, 0, 2).count()
    feed = change_feed(spark, p, 0, 2, encryption_key=KEY)
    legs = {
        (r["_change_type"],): r["n"]
        for r in feed.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    }
    assert legs[("insert",)] == 50  # the second append
    assert legs[("delete",)] == 30  # grp==0 of 150 keys


def test_change_feed_keyed_restore_resurrection(spark, tmp_path):
    p = _encrypted_table(spark, tmp_path)
    keys = spark.range(0, 20).select(F.col("id").alias("k"))
    delete_keys(spark, p, keys, "k", encryption_key=KEY)
    rollback(p, 1)  # resurrect the 20 tombstoned rows
    feed = change_feed(spark, p, 2, 3, encryption_key=KEY)
    rows = feed.groupBy("_change_type").count().collect()
    legs = {r["_change_type"]: r["count"] for r in rows}
    assert legs == {"insert": 20}
    from argodb_mapreduce_spark.sources import manifest_log as ml
    from argodb_mapreduce_spark.sources.versioned import key_fingerprint

    head = ml.head_entry(p)
    assert head["encrypted"] and head["key_fp"] == key_fingerprint(KEY)


def test_clone_carries_key_fingerprint(spark, tmp_path):
    from argodb_mapreduce_spark.sources import manifest_log as ml
    from argodb_mapreduce_spark.sources.versioned import clone_table, key_fingerprint

    p = _encrypted_table(spark, tmp_path)
    dst = str(tmp_path / "clone")
    clone_table(p, dst)
    head = ml.head_entry(dst)
    assert head["encrypted"] and head["key_fp"] == key_fingerprint(KEY)
    assert snapshot_read(spark, dst, encryption_key=KEY).count() == 150


# ---------------------------------------------------------------------------
# Un-CDC UPDATE/MERGE feed synthesis (VERDICT r13 ask #4)
# ---------------------------------------------------------------------------


def test_streaming_cdf_through_uncdc_update(spark, tmp_path):
    """readChangeFeed over an UPDATE that recorded no CDC sidecar:
    the rewritten-segment diff synthesizes drop legs (pre-update rows)
    and add legs (post-update rows) — kinds map to delete/insert
    _change_type — instead of killing the stream."""
    from argodb_mapreduce_spark.sources.versioned import update_where

    p = str(tmp_path / "t")
    versioned_write(
        spark.range(0, 40).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).alias("g"),
            (F.col("id") * 10).cast("long").alias("v"),
        ),
        p,
        mode="append",
    )
    update_where(spark, p, [("k", "<", 5)], {"v": F.col("v") + 1})
    cells = _drain(
        spark,
        _stream_feed(spark, p, readChangeFeed="true"),
        "t14_uncdc_update",
    )
    # v0: initial snapshot inserts; v1: 40 deletes + 40 inserts
    assert cells[("insert", 0)] == (40, sum(range(40)))
    assert cells[("delete", 1)] == (40, sum(range(40)))
    assert cells[("insert", 1)] == (40, sum(range(40)))


def test_mv_incremental_through_uncdc_update(spark, tmp_path):
    """MV maintenance consumes the synthesized update legs as signed
    partials — net-zero pairs for unchanged rows, (-old,+new) for
    updated ones — instead of falling back to a full recompute."""
    from argodb_mapreduce_spark.operators.materialized_view import (
        mv_create,
        mv_refresh,
    )
    from argodb_mapreduce_spark.sources.versioned import update_where

    p = str(tmp_path / "t")
    versioned_write(
        spark.range(0, 60).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).alias("g"),
            (F.col("id") * 10).cast("long").alias("v"),
        ),
        p,
        mode="append",
    )
    mv = str(tmp_path / "mv")
    mv_create(spark, p, mv, group_cols=["g"], sum_cols=["v"])
    update_where(spark, p, [("k", "<", 6)], {"v": F.col("v") + 100})
    info = mv_refresh(spark, mv)
    assert info["mode"] == "incremental-cdf", info
    got = {
        r["g"]: (r["n_rows"], r["sum_v"])
        for r in snapshot_read(spark, mv).collect()
    }
    want = {}
    for k in range(60):
        v = k * 10 + (100 if k < 6 else 0)
        n, s = want.get(k % 3, (0, 0))
        want[k % 3] = (n + 1, s + v)
    assert got == want


def test_update_where_on_encrypted_table(spark, tmp_path):
    from argodb_mapreduce_spark.sources import manifest_log as ml
    from argodb_mapreduce_spark.sources.versioned import (
        key_fingerprint,
        update_where,
    )

    p = _encrypted_table(spark, tmp_path)
    res = update_where(
        spark, p, [("k", "<", 10)], {"grp": F.lit(99).cast("bigint")},
        encryption_key=KEY,
    )
    assert res["rows_updated"] == 10
    df = snapshot_read(spark, p, encryption_key=KEY)
    assert df.filter(F.col("grp") == 99).count() == 10
    assert df.count() == 150
    head = ml.head_entry(p)
    assert head["encrypted"] and head["key_fp"] == key_fingerprint(KEY)
    assert not head.get("stats"), "encrypted rewrite must record no stats"
    # keyed feed through the un-CDC UPDATE: file-level legs
    feed = change_feed(spark, p, 1, head["version"], encryption_key=KEY)
    legs = {
        r["_change_type"]: r["count"]
        for r in feed.groupBy("_change_type").count().collect()
    }
    assert legs["delete"] == 150 and legs["insert"] == 150


def test_merge_upsert_on_encrypted_table(spark, tmp_path):
    import pyarrow.parquet as pq

    from argodb_mapreduce_spark.sources import manifest_log as ml
    from argodb_mapreduce_spark.sources.versioned import merge_upsert

    p = _encrypted_table(spark, tmp_path)
    src = spark.range(140, 170).select(
        F.col("id").alias("k"),
        F.lit(7).cast("bigint").alias("grp"),
        F.lit("merged").alias("s"),
    )
    res = merge_upsert(spark, p, src, "k", encryption_key=KEY)
    assert res["rows_upserted"] > 0
    df = snapshot_read(spark, p, encryption_key=KEY)
    assert df.count() == 170  # 150 + 20 new keys (150..169)
    assert df.filter(F.col("s") == "merged").count() == 30
    head = ml.head_entry(p)
    assert head["encrypted"]
    # rewritten segment stays keyless-unreadable
    f = sorted(
        glob.glob(os.path.join(p, head["segments"][-1], "*.parquet"))
    )[0]
    with pytest.raises(OSError):
        pq.ParquetFile(f).read()


def test_cdf_property_refused_on_encrypted_table(spark, tmp_path):
    from argodb_mapreduce_spark.sources.versioned import (
        enable_change_data_feed,
    )

    p = _encrypted_table(spark, tmp_path)
    with pytest.raises(ValueError, match="PLAINTEXT"):
        enable_change_data_feed(p)


def test_streaming_cdf_keyed_through_uncdc_update_on_encrypted(spark, tmp_path):
    """The full r14 composition: an ENCRYPTED table takes a keyed un-CDC
    UPDATE, and a readChangeFeed stream WITH the key replays the
    synthesized file-level legs — decryption inside the CDF partition
    reads, no plaintext sidecar anywhere."""
    from argodb_mapreduce_spark.sources.versioned import update_where

    p = _encrypted_table(spark, tmp_path)
    update_where(
        spark, p, [("k", "<", 5)], {"grp": F.lit(42).cast("bigint")},
        encryption_key=KEY,
    )
    cells = _drain(
        spark,
        _stream_feed(spark, p, readChangeFeed="true", encryptionKey=KEY),
        "t14_enc_uncdc",
    )
    # v0/v1 initial inserts; v2: 150 deletes + 150 inserts (file-level)
    assert cells[("insert", 0)] == (100, sum(range(100)))
    assert cells[("insert", 1)] == (50, sum(range(100, 150)))
    assert cells[("delete", 2)] == (150, sum(range(150)))
    assert cells[("insert", 2)] == (150, sum(range(150)))


def test_keyed_rowgroup_pruning_on_encrypted(spark, tmp_path):
    """With the key, per-row-group statistics ARE readable — the keyed
    scan skips non-overlapping row groups, restoring the data skipping
    the manifest gives up on encrypted tables (no plaintext stats).
    Monotonic k + 20-row row groups make skipping directly observable:
    a pruned scan's minimum k is the first kept group's floor, while an
    unpruned scan of the same (unfiltered-superset) contract would
    return k=0."""
    from argodb_mapreduce_spark.sources.python_datasource import (
        FORMAT_NAME,
        register_datasource,
    )

    register_datasource(spark)
    p = str(tmp_path / "encrg")
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "20")
    try:
        (
            spark.range(0, 200)
            .coalesce(1)
            .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
            .write.format(FORMAT_NAME)
            .option("encryptionKey", KEY)
            .mode("append")
            .save(p)
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    import glob as _g

    import pyarrow.parquet as pq

    # fixture sanity: the one file really has multiple row groups
    # (readable keyless: num_row_groups is a plaintext-footer field)
    f = _g.glob(os.path.join(p, "data-0", "*.parquet"))[0]
    assert pq.ParquetFile(f).metadata.num_row_groups >= 10
    # the SCAN level (before snapshot_read's exact residual filter)
    # shows the pruning: whole row groups in, non-overlapping ones out
    from argodb_mapreduce_spark.sources.versioned import (
        _read_manifest,
        _read_segment_dirs,
    )

    entry = _read_manifest(p)[-1]
    scan = _read_segment_dirs(
        spark, p, entry["segments"], entry, evolved=False,
        encryption_key=KEY, predicates=[("k", ">=", 100)],
    )
    got = scan.agg(F.min("k").alias("mn"), F.count(F.lit(1)).alias("n")).first()
    assert got["mn"] == 100 and got["n"] == 100  # groups 0..4 skipped
    eq_scan = _read_segment_dirs(
        spark, p, entry["segments"], entry, evolved=False,
        encryption_key=KEY, predicates=[("k", "=", 57)],
    )
    ks = sorted(r["k"] for r in eq_scan.collect())
    assert ks == list(range(40, 60))  # exactly the owning row group
    # end-to-end: snapshot_read stays EXACT on the pruned scan
    pruned = snapshot_read(
        spark, p, predicates=[("k", ">=", 100)], encryption_key=KEY
    )
    full = snapshot_read(spark, p, encryption_key=KEY)
    assert pruned.count() == 100
    assert (
        pruned.agg(F.sum("v")).first()[0]
        == full.filter(F.col("k") >= 100).agg(F.sum("v")).first()[0]
    )


# --- encryption key ROTATION (r14): O(1) KEK re-wrap, zero rewrites ---

NEW = base64.b64encode(bytes(range(100, 132))).decode()
THIRD = base64.b64encode(bytes(range(200, 232))).decode()


def test_rotate_key_new_reads_everything_old_refused(spark, tmp_path):
    from argodb_mapreduce_spark.sources import manifest_log as ml
    from argodb_mapreduce_spark.sources.versioned import (
        key_fingerprint,
        rotate_encryption_key,
    )

    p = _encrypted_table(spark, tmp_path)
    res = rotate_encryption_key(p, KEY, NEW)
    assert res["files_rewritten"] == 0 and res["rotations"] == 1
    # every pre-rotation byte reads under the NEW master (KEK unchanged)
    df = snapshot_read(spark, p, encryption_key=NEW)
    assert df.count() == 150
    assert df.agg(F.sum("k")).first()[0] == sum(range(150))
    # the OLD master is refused at PLAN time
    with pytest.raises(ValueError, match="ROTATED OUT"):
        snapshot_read(spark, p, encryption_key=KEY)
    head = ml.head_entry(p)
    assert head["key_fp"] == key_fingerprint(NEW)
    assert head.get("rotate_key") is True


def test_rotate_key_time_travel_reads_old_versions_under_new_key(
    spark, tmp_path
):
    from argodb_mapreduce_spark.sources.versioned import (
        rotate_encryption_key,
    )

    p = _encrypted_table(spark, tmp_path)
    rotate_encryption_key(p, KEY, NEW)
    # v0 was committed under the OLD master's fingerprint; same KEK
    # lineage -> readable under the NEW master
    v0 = snapshot_read(spark, p, version=0, encryption_key=NEW)
    assert v0.count() == 100
    with pytest.raises(ValueError, match="ROTATED OUT"):
        snapshot_read(spark, p, version=0, encryption_key=KEY)


def test_rotate_key_writes_and_dml_under_new_key(spark, tmp_path):
    from argodb_mapreduce_spark.sources.python_datasource import FORMAT_NAME
    from argodb_mapreduce_spark.sources.versioned import (
        rotate_encryption_key,
    )

    p = _encrypted_table(spark, tmp_path)
    rotate_encryption_key(p, KEY, NEW)
    # append with the OLD master: refused (fingerprint mismatch vs the
    # rotated head OR sidecar retirement — either gate fires first)
    with pytest.raises(Exception, match="fingerprint|ROTATED"):
        (
            spark.range(150, 160)
            .select(
                F.col("id").alias("k"),
                (F.col("id") % 5).alias("grp"),
                F.lit("x").alias("s"),
            )
            .write.format(FORMAT_NAME)
            .option("encryptionKey", KEY)
            .mode("append")
            .save(p)
        )
    # append with the NEW master: wraps under the SAME table KEK
    (
        spark.range(150, 160)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 5).alias("grp"),
            F.lit("y").alias("s"),
        )
        .write.format(FORMAT_NAME)
        .option("encryptionKey", NEW)
        .mode("append")
        .save(p)
    )
    df = snapshot_read(spark, p, encryption_key=NEW)
    assert df.count() == 160
    # keyed DML under the NEW master reaches pre-rotation files
    keys = spark.range(0, 30).select(F.col("id").alias("k"))
    _v, n = delete_keys(spark, p, keys, "k", encryption_key=NEW)
    assert n == 30
    assert snapshot_read(spark, p, encryption_key=NEW).count() == 130


def test_double_rotation_only_latest_master_lives(spark, tmp_path):
    from argodb_mapreduce_spark.sources.versioned import (
        rotate_encryption_key,
    )

    p = _encrypted_table(spark, tmp_path)
    rotate_encryption_key(p, KEY, NEW)
    res = rotate_encryption_key(p, NEW, THIRD)
    assert res["rotations"] == 2 and res["files_rewritten"] == 0
    assert snapshot_read(spark, p, encryption_key=THIRD).count() == 150
    for dead in (KEY, NEW):
        with pytest.raises(ValueError, match="ROTATED OUT"):
            snapshot_read(spark, p, encryption_key=dead)


def test_rotate_key_guards(spark, tmp_path):
    from argodb_mapreduce_spark.sources.versioned import (
        KEYS_SIDECAR,
        rotate_encryption_key,
    )

    p = _encrypted_table(spark, tmp_path)
    # same key -> refused
    with pytest.raises(ValueError, match="equals"):
        rotate_encryption_key(p, KEY, KEY)
    # a non-current "old" master -> refused
    with pytest.raises(ValueError, match="CURRENT"):
        rotate_encryption_key(p, WRONG, NEW)
    # legacy table (no sidecar: file DEKs wrapped by the master
    # directly) -> rotation requires a rewrite, refused loudly
    os.remove(os.path.join(p, KEYS_SIDECAR))
    with pytest.raises(ValueError, match="predates"):
        rotate_encryption_key(p, KEY, NEW)
    # plaintext table -> refused
    q = str(tmp_path / "plain")
    versioned_write(
        spark.range(5).select(F.col("id").alias("k")), q, mode="append"
    )
    with pytest.raises(ValueError, match="encrypted head"):
        rotate_encryption_key(q, KEY, NEW)


def test_legacy_encrypted_table_still_reads_master_direct(spark, tmp_path):
    """Tables written before the KEK sidecar existed wrap file DEKs
    under the master itself; with the sidecar removed the read path
    must fall back to exactly that wire format."""
    from argodb_mapreduce_spark.sources.versioned import KEYS_SIDECAR

    p = _encrypted_table(spark, tmp_path)
    os.remove(os.path.join(p, KEYS_SIDECAR))
    # Post-sidecar tables wrap DEKs under the KEK, so deleting the
    # sidecar makes the master-direct fallback fail at unwrap — which
    # is itself the loud-failure contract; what must NOT happen is a
    # silent empty/garbage read.
    with pytest.raises(Exception):
        snapshot_read(spark, p, encryption_key=KEY).collect()


def test_rotate_key_carries_column_mapping_and_dv(spark, tmp_path):
    """The rotation commit is metadata-only: renames, mapping state and
    the deletion vector must survive it verbatim."""
    from argodb_mapreduce_spark.sources import manifest_log as ml
    from argodb_mapreduce_spark.sources.versioned import (
        rotate_encryption_key,
    )

    p = _encrypted_table(spark, tmp_path)
    keys = spark.range(0, 10).select(F.col("id").alias("k"))
    delete_keys(spark, p, keys, "k", encryption_key=KEY)
    before = ml.head_entry(p)
    assert before.get("dv")
    rotate_encryption_key(p, KEY, NEW)
    after = ml.head_entry(p)
    assert after["segments"] == before["segments"]
    assert after.get("dv") == before.get("dv")
    for carried in ("renames", "mapping_active", "cmap", "num_rows"):
        assert after.get(carried) == before.get(carried)
    df = snapshot_read(spark, p, encryption_key=NEW)
    assert df.count() == 140 and df.filter(F.col("k") < 10).count() == 0


def test_rotation_survives_streaming_tail_plan(spark, tmp_path):
    """A stream planned AFTER a rotation decrypts with the (unchanged)
    table KEK resolved from the new master."""
    from argodb_mapreduce_spark.sources.python_datasource import (
        FORMAT_NAME,
    )
    from argodb_mapreduce_spark.sources.versioned import (
        rotate_encryption_key,
    )

    p = _encrypted_table(spark, tmp_path)
    rotate_encryption_key(p, KEY, NEW)
    s = (
        spark.readStream.format(FORMAT_NAME)
        .option("encryptionKey", NEW)
        .load(p)
    )
    sink = "rot_stream_sink"
    q = (
        s.agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table(sink).first()["n"] == 150


def test_clone_forks_key_sidecar_rotation_independent(spark, tmp_path):
    """A shallow clone of an encrypted table copies the key sidecar
    (the borrowed files' DEKs are wrapped under the source's KEK);
    rotating the SOURCE afterwards does not retire the clone's master —
    fork semantics, same as segment references."""
    from argodb_mapreduce_spark.sources.versioned import (
        clone_table,
        rotate_encryption_key,
    )

    p = _encrypted_table(spark, tmp_path)
    dst = str(tmp_path / "fork")
    clone_table(p, dst)
    assert snapshot_read(spark, dst, encryption_key=KEY).count() == 150
    rotate_encryption_key(p, KEY, NEW)
    # source: only the new master lives
    with pytest.raises(ValueError, match="ROTATED OUT"):
        snapshot_read(spark, p, encryption_key=KEY)
    # clone: pinned to the fork point — the old master still reads
    assert snapshot_read(spark, dst, encryption_key=KEY).count() == 150
    with pytest.raises(ValueError, match="sidecar"):
        snapshot_read(spark, dst, encryption_key=NEW)


# --- COLUMN-level encryption (r14): encrypt only the sensitive columns ---


def _col_encrypted_table(spark, tmp_path, name="cenc"):
    """Two appends with only `ssn` encrypted; k/grp stay plaintext."""
    from argodb_mapreduce_spark.sources.python_datasource import (
        FORMAT_NAME,
        register_datasource,
    )

    register_datasource(spark)
    p = str(tmp_path / name)
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("grp"),
        F.concat(F.lit("pii-"), F.col("id")).alias("ssn"),
    )
    for m in (0, 1):
        (
            df.filter(F.col("k") % 2 == m)
            .write.format(FORMAT_NAME)
            .option("encryptionKey", KEY)
            .option("encryptColumns", "ssn")
            .mode("append")
            .save(p)
        )
    return p


def test_column_encrypted_keyless_subset_reads(spark, tmp_path):
    p = _col_encrypted_table(spark, tmp_path)
    sub = snapshot_read(spark, p, columns=["k", "grp"])
    assert sub.count() == 100
    assert sub.agg(F.sum("k")).first()[0] == sum(range(100))
    # full keyless read and keyless projection of the encrypted column
    # are refused with guidance
    with pytest.raises(ValueError, match="COLUMN-encrypted"):
        snapshot_read(spark, p)
    with pytest.raises(ValueError, match="ENCRYPTED"):
        snapshot_read(spark, p, columns=["k", "ssn"])
    with pytest.raises(ValueError, match="keyless"):
        snapshot_read(
            spark, p, columns=["k"], predicates=[("ssn", "=", "pii-1")]
        )


def test_column_encrypted_keyed_read_and_stats(spark, tmp_path):
    from argodb_mapreduce_spark.sources import manifest_log as ml

    p = _col_encrypted_table(spark, tmp_path)
    full = snapshot_read(spark, p, encryption_key=KEY)
    assert full.count() == 100
    assert full.filter(F.col("ssn") == "pii-7").count() == 1
    head = ml.head_entry(p)
    assert head.get("enc_columns") == ["ssn"]
    # manifest stats exist for the PLAINTEXT columns only — pruning
    # preserved, zero leak of the protected column's value range
    statcols = {c for seg in head.get("stats", {}).values() for c in seg}
    assert statcols == {"k", "grp"}
    pruned = snapshot_read(
        spark, p, columns=["k"], predicates=[("k", ">=", 90)]
    )
    assert pruned.count() == 10


def test_column_encrypted_file_bytes(spark, tmp_path):
    """On-disk proof: plaintext columns read keyless straight from the
    file, the encrypted column refuses without the key."""
    import pyarrow.parquet as pq

    from argodb_mapreduce_spark.sources import manifest_log as ml

    p = _col_encrypted_table(spark, tmp_path)
    head = ml.head_entry(p)
    f = sorted(glob.glob(os.path.join(p, head["segments"][0], "*.parquet")))[0]
    assert pq.ParquetFile(f).read(columns=["k"]).num_rows > 0
    with pytest.raises(OSError):
        pq.ParquetFile(f).read(columns=["ssn"])


def test_column_encrypted_dml_and_compact_keep_shape(spark, tmp_path):
    from argodb_mapreduce_spark.sources import manifest_log as ml
    from argodb_mapreduce_spark.sources.versioned import compact

    p = _col_encrypted_table(spark, tmp_path)
    keys = spark.range(0, 10).select(F.col("id").alias("k"))
    _v, n = delete_keys(spark, p, keys, "k", encryption_key=KEY)
    assert n == 10
    assert snapshot_read(spark, p, columns=["k"]).count() == 90
    compact(spark, p, flatten=True, encryption_key=KEY)
    head = ml.head_entry(p)
    # the rewrite kept the COLUMN-level shape: marker carried, new
    # file's plaintext columns keyless-readable, ssn still locked
    assert head.get("enc_columns") == ["ssn"]
    assert snapshot_read(spark, p, columns=["k", "grp"]).count() == 90
    import pyarrow.parquet as pq

    f = sorted(glob.glob(os.path.join(p, head["segments"][-1], "*.parquet")))[0]
    assert pq.ParquetFile(f).read(columns=["k"]).num_rows == 90
    with pytest.raises(OSError):
        pq.ParquetFile(f).read(columns=["ssn"])
    assert (
        snapshot_read(spark, p, encryption_key=KEY)
        .filter(F.col("ssn") == "pii-7")
        .count()
        == 0
    )


def test_column_encrypted_append_shape_gate(spark, tmp_path):
    from argodb_mapreduce_spark.sources.python_datasource import FORMAT_NAME

    p = _col_encrypted_table(spark, tmp_path)
    one = spark.range(100, 101).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("grp"),
        F.lit("pii-x").alias("ssn"),
    )
    for cols in ("grp", None):  # different set / full-table encryption
        w = (
            one.write.format(FORMAT_NAME)
            .option("encryptionKey", KEY)
            .mode("append")
        )
        if cols:
            w = w.option("encryptColumns", cols)
        with pytest.raises(Exception, match="encrypted-column set"):
            w.save(p)
    # the matching shape appends fine
    (
        one.write.format(FORMAT_NAME)
        .option("encryptionKey", KEY)
        .option("encryptColumns", "ssn")
        .mode("append")
        .save(p)
    )
    assert snapshot_read(spark, p, columns=["k"]).count() == 101


def test_column_encrypted_option_validation(spark, tmp_path):
    from argodb_mapreduce_spark.sources.python_datasource import (
        FORMAT_NAME,
        register_datasource,
    )

    register_datasource(spark)
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(Exception, match="requires option"):
        (
            df.write.format(FORMAT_NAME)
            .option("encryptColumns", "k")
            .mode("append")
            .save(str(tmp_path / "nokey"))
        )
    with pytest.raises(Exception, match="not in the write schema"):
        (
            df.write.format(FORMAT_NAME)
            .option("encryptionKey", KEY)
            .option("encryptColumns", "nope")
            .mode("append")
            .save(str(tmp_path / "badcol"))
        )


def test_column_encrypted_rotation_composes(spark, tmp_path):
    """Key rotation on a COLUMN-encrypted table: keyless subset reads
    are unaffected, the encrypted column re-keys to the new master."""
    from argodb_mapreduce_spark.sources.versioned import (
        rotate_encryption_key,
    )

    p = _col_encrypted_table(spark, tmp_path)
    res = rotate_encryption_key(p, KEY, NEW)
    assert res["files_rewritten"] == 0
    assert snapshot_read(spark, p, columns=["k", "grp"]).count() == 100
    assert (
        snapshot_read(spark, p, encryption_key=NEW)
        .filter(F.col("ssn") == "pii-7")
        .count()
        == 1
    )
    with pytest.raises(ValueError, match="ROTATED OUT"):
        snapshot_read(spark, p, encryption_key=KEY)


def test_plaintext_snapshot_read_columns_projection(spark, tmp_path):
    """columns= on a PLAINTEXT table is a plan-time select — and the
    scan's ReadSchema shrinks to exactly the requested columns."""
    p = str(tmp_path / "plainproj")
    versioned_write(
        spark.range(0, 50).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).alias("g"),
            F.concat(F.lit("s"), F.col("id")).alias("s"),
        ),
        p,
        mode="append",
    )
    df = snapshot_read(spark, p, columns=["k", "g"])
    assert df.columns == ["k", "g"] and df.count() == 50
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan and "s:" not in plan.split("ReadSchema")[1][:80]
    # predicates on a non-projected column still evaluate
    df2 = snapshot_read(
        spark, p, columns=["k"], predicates=[("g", "=", 1)]
    )
    assert df2.columns == ["k"] and df2.count() == 17


def test_column_encrypted_partition_col_refused(spark, tmp_path):
    from argodb_mapreduce_spark.sources.python_datasource import (
        FORMAT_NAME,
        register_datasource,
    )

    register_datasource(spark)
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("g")
    )
    with pytest.raises(Exception, match="plaintext directory"):
        (
            df.write.format(FORMAT_NAME)
            .option("encryptionKey", KEY)
            .option("encryptColumns", "g")
            .option("partitionBy", "g")
            .mode("append")
            .save(str(tmp_path / "encpart"))
        )


def test_column_encrypted_partitioned_keyless_subset(spark, tmp_path):
    """Hive-partitioned + column-encrypted: keyless subset reads serve
    partition constants and plaintext data columns; projecting ONLY
    partition columns exercises the zero-decode constants path."""
    from argodb_mapreduce_spark.sources.python_datasource import (
        FORMAT_NAME,
        register_datasource,
    )

    register_datasource(spark)
    p = str(tmp_path / "cencpart")
    df = spark.range(0, 60).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).alias("g"),
        F.concat(F.lit("pii-"), F.col("id")).alias("ssn"),
    )
    (
        df.write.format(FORMAT_NAME)
        .option("encryptionKey", KEY)
        .option("encryptColumns", "ssn")
        .option("partitionBy", "g")
        .mode("append")
        .save(p)
    )
    sub = snapshot_read(spark, p, columns=["k", "g"])
    assert sub.count() == 60
    assert sub.filter(F.col("g") == 1).count() == 20
    # partition-only projection: no parquet byte needs decoding
    gonly = snapshot_read(spark, p, columns=["g"])
    assert gonly.groupBy("g").count().count() == 3
    assert (
        snapshot_read(spark, p, encryption_key=KEY)
        .filter(F.col("ssn") == "pii-7")
        .count()
        == 1
    )
    with pytest.raises(ValueError, match="ENCRYPTED"):
        snapshot_read(spark, p, columns=["g", "ssn"])


# --- r14 second-pass review regressions (nested leaves, legacy lineage,
# --- rotation crash window, orphan sidecar, OPTIMIZE stats) ---


def test_nested_column_encryption_roundtrip_and_stats(spark, tmp_path):
    """encryptColumns on a NESTED column: keyed reads return the real
    values (file_tops must match by dotted path, not bare leaf name),
    the commit-time plaintext stats harvest must not touch the nested
    encrypted leaves (keyless chunk access hard-aborts the process),
    and keyless subset reads of the flat plaintext columns work."""
    from argodb_mapreduce_spark.sources import manifest_log as ml
    from argodb_mapreduce_spark.sources.python_datasource import (
        FORMAT_NAME,
        register_datasource,
    )

    register_datasource(spark)
    p = str(tmp_path / "nestenc")
    df = spark.range(0, 40).select(
        F.col("id").alias("k"),
        F.array(F.col("id"), F.col("id") * 2).alias("emb"),
    )
    (
        df.write.format(FORMAT_NAME)
        .option("encryptionKey", KEY)
        .option("encryptColumns", "emb")
        .mode("append")
        .save(p)
    )
    # the very fact the commit finished proves the harvest didn't abort
    head = ml.head_entry(p)
    statcols = {c for seg in head.get("stats", {}).values() for c in seg}
    assert statcols == {"k"}
    keyed = snapshot_read(spark, p, encryption_key=KEY)
    row = keyed.filter(F.col("k") == 7).select("emb").first()
    assert row["emb"] == [7, 14]  # NOT nulls
    assert (
        keyed.select(F.explode("emb").alias("e")).agg(F.sum("e")).first()[0]
        == sum(range(40)) * 3
    )
    sub = snapshot_read(spark, p, columns=["k"])
    assert sub.count() == 40
    with pytest.raises(ValueError, match="ENCRYPTED"):
        snapshot_read(spark, p, columns=["emb"])


def _legacy_encrypted_table(spark, tmp_path):
    """A PRE-SIDECAR (r13-format) encrypted table: file data keys are
    wrapped by the MASTER directly, no _keys.json. Built through the
    keyed segment writer (which wraps master-direct when no sidecar
    exists) + a hand-published manifest entry."""
    import json as _j

    from argodb_mapreduce_spark.sources import manifest_log as ml
    from argodb_mapreduce_spark.sources.versioned import (
        _write_segment_keyed,
        key_fingerprint,
    )

    p = str(tmp_path / "legacy")
    os.makedirs(p, exist_ok=True)
    df = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("grp")
    )
    _write_segment_keyed(df.coalesce(1), os.path.join(p, "data-0"), KEY)
    entry = {
        "version": 0,
        "segments": ["data-0"],
        "encrypted": True,
        "key_fp": key_fingerprint(KEY),
        "schemas": {"data-0": {"k": "bigint", "grp": "bigint"}},
        "ts": 1.0,
    }
    ml.append_entry(p, [entry])
    assert not os.path.exists(os.path.join(p, "_keys.json"))
    return p


def test_legacy_table_appends_stay_master_direct(spark, tmp_path):
    """Appending (and overwriting) a legacy master-direct table must
    NOT mint a KEK sidecar: resolve_wrap_key is lineage-global, so a
    mid-history sidecar would break time travel over the pre-sidecar
    versions."""
    from argodb_mapreduce_spark.sources.python_datasource import FORMAT_NAME
    from argodb_mapreduce_spark.sources.versioned import KEYS_SIDECAR

    p = _legacy_encrypted_table(spark, tmp_path)
    assert snapshot_read(spark, p, encryption_key=KEY).count() == 50
    (
        spark.range(50, 60)
        .select(F.col("id").alias("k"), (F.col("id") % 5).alias("grp"))
        .write.format(FORMAT_NAME)
        .option("encryptionKey", KEY)
        .mode("append")
        .save(p)
    )
    assert not os.path.exists(os.path.join(p, KEYS_SIDECAR))
    assert snapshot_read(spark, p, encryption_key=KEY).count() == 60
    # overwrite: same rule — the manifest still holds the legacy v0
    (
        spark.range(0, 20)
        .select(F.col("id").alias("k"), (F.col("id") % 5).alias("grp"))
        .write.format(FORMAT_NAME)
        .option("encryptionKey", KEY)
        .mode("overwrite")
        .save(p)
    )
    assert not os.path.exists(os.path.join(p, KEYS_SIDECAR))
    assert snapshot_read(spark, p, encryption_key=KEY).count() == 20
    # the review's repro: TIME TRAVEL to the pre-overwrite legacy
    # version still reads under the correct master
    assert snapshot_read(spark, p, version=0, encryption_key=KEY).count() == 50


def test_rotation_crash_window_append_heals(spark, tmp_path):
    """Crash between rotation's sidecar write and its manifest append:
    the head still carries the OLD fingerprint while only the NEW
    master is live. An append under the new master must be allowed
    (same KEK lineage) and heal the head; the old master stays dead."""
    from argodb_mapreduce_spark.sources import manifest_log as ml
    from argodb_mapreduce_spark.sources.python_datasource import FORMAT_NAME
    from argodb_mapreduce_spark.sources.versioned import (
        key_fingerprint,
        rotate_encryption_key,
    )

    p = _encrypted_table(spark, tmp_path)
    rotate_encryption_key(p, KEY, NEW)
    # simulate the crash: drop the rotation's manifest entry, keep the
    # sidecar (the order rotation writes them in)
    entries = ml.read_entries(p)
    assert entries[-1].get("rotate_key")
    ml.rewrite(p, entries[:-1])
    assert ml.head_entry(p)["key_fp"] == key_fingerprint(KEY)
    with pytest.raises(Exception, match="fingerprint|ROTATED"):
        (
            spark.range(150, 151)
            .select(F.col("id").alias("k"), (F.col("id") % 5).alias("grp"),
                    F.lit("x").alias("s"))
            .write.format(FORMAT_NAME)
            .option("encryptionKey", KEY)
            .mode("append")
            .save(p)
        )
    (
        spark.range(150, 160)
        .select(F.col("id").alias("k"), (F.col("id") % 5).alias("grp"),
                F.lit("y").alias("s"))
        .write.format(FORMAT_NAME)
        .option("encryptionKey", NEW)
        .mode("append")
        .save(p)
    )
    assert ml.head_entry(p)["key_fp"] == key_fingerprint(NEW)
    assert snapshot_read(spark, p, encryption_key=NEW).count() == 160


def test_orphan_sidecar_does_not_block_fresh_encrypted_write(
    spark, tmp_path
):
    """An aborted first-ever encrypted commit can leave a sidecar with
    NO committed encrypted entry; the manifest is the authority — a
    later encrypted write under a different master mints freely."""
    import json as _j

    from argodb_mapreduce_spark.sources.python_datasource import FORMAT_NAME
    from argodb_mapreduce_spark.sources.versioned import KEYS_SIDECAR

    p = str(tmp_path / "orphan")
    versioned_write(
        spark.range(5).select(F.col("id").alias("k")), p, mode="append"
    )
    with open(os.path.join(p, KEYS_SIDECAR), "w") as f:
        _j.dump(
            {"keks": {"deadbeef00000000": {"wrapped": "xx", "kek_id": "zz"}},
             "current_fp": "deadbeef00000000", "rotations": 0},
            f,
        )
    (
        spark.range(10).select(F.col("id").alias("k"))
        .write.format(FORMAT_NAME)
        .option("encryptionKey", KEY)
        .mode("overwrite")
        .save(p)
    )
    assert snapshot_read(spark, p, encryption_key=KEY).count() == 10
    # append mode works too on a fresh-history table with an orphan
    p2 = str(tmp_path / "orphan2")
    os.makedirs(p2)
    with open(os.path.join(p2, KEYS_SIDECAR), "w") as f:
        _j.dump(
            {"keks": {"deadbeef00000000": {"wrapped": "xx", "kek_id": "zz"}},
             "current_fp": "deadbeef00000000", "rotations": 0},
            f,
        )
    (
        spark.range(7).select(F.col("id").alias("k"))
        .write.format(FORMAT_NAME)
        .option("encryptionKey", KEY)
        .mode("append")
        .save(p2)
    )
    assert snapshot_read(spark, p2, encryption_key=KEY).count() == 7


def test_column_encrypted_compact_keeps_plaintext_stats(spark, tmp_path):
    """OPTIMIZE on a column-encrypted table re-harvests plaintext-
    column stats — keyless-subset pruning survives compaction."""
    from argodb_mapreduce_spark.sources import manifest_log as ml
    from argodb_mapreduce_spark.sources.versioned import compact

    p = _col_encrypted_table(spark, tmp_path)
    compact(spark, p, flatten=True, encryption_key=KEY)
    head = ml.head_entry(p)
    statcols = {c for seg in head.get("stats", {}).values() for c in seg}
    assert "k" in statcols and "ssn" not in statcols
    # pruning actually fires post-compact: a fully-out-of-range
    # predicate returns empty without error
    assert (
        snapshot_read(
            spark, p, columns=["k"], predicates=[("k", ">=", 1000)]
        ).count()
        == 0
    )


def test_column_encrypted_restore_and_feed(spark, tmp_path):
    """ROLLBACK and the keyed change feed compose with column-level
    encryption: the enc_columns marker forks with every derived entry,
    keyless subset reads work at any version, and the synthesized
    update legs decrypt under the key."""
    from argodb_mapreduce_spark.sources.versioned import (
        change_feed,
        rollback,
        update_where,
    )

    p = _col_encrypted_table(spark, tmp_path)
    res = update_where(
        spark,
        p,
        [("k", "<", 10)],
        {"ssn": F.lit("redacted")},
        encryption_key=KEY,
    )
    legs = change_feed(
        spark, p, res["version"] - 1, res["version"], encryption_key=KEY
    )
    assert legs.filter(F.col("_change_type") == "insert").count() > 0
    with pytest.raises(ValueError, match="encrypt"):
        change_feed(spark, p, res["version"] - 1, res["version"])
    v0 = rollback(p, res["version"] - 1)
    from argodb_mapreduce_spark.sources import manifest_log as ml

    head = ml.head_entry(p)
    assert head.get("enc_columns") == ["ssn"]
    assert snapshot_read(spark, p, columns=["k", "grp"]).count() == 100
    assert (
        snapshot_read(spark, p, encryption_key=KEY)
        .filter(F.col("ssn") == "redacted")
        .count()
        == 0
    )


def test_column_encrypted_erase_prunes_by_plaintext_stats(spark, tmp_path):
    """GDPR erase on a COLUMN-encrypted table: the erase-key column is
    plaintext, so its manifest min/max stats exist and the set-based
    delete prunes untouched segments — fully-encrypted tables give
    that up (no stats), column-encrypted ones keep it."""
    from argodb_mapreduce_spark.sources import manifest_log as ml
    from argodb_mapreduce_spark.sources.python_datasource import (
        FORMAT_NAME,
        register_datasource,
    )
    from argodb_mapreduce_spark.sources.versioned import (
        _segments_possibly_holding_keys,
    )

    register_datasource(spark)
    p = str(tmp_path / "cencprune")
    for q in range(4):  # 4 key-ranged segments
        (
            spark.range(q * 100, (q + 1) * 100)
            .select(
                F.col("id").alias("k"),
                F.concat(F.lit("p-"), F.col("id")).alias("ssn"),
            )
            .write.format(FORMAT_NAME)
            .option("encryptionKey", KEY)
            .option("encryptColumns", "ssn")
            .mode("append")
            .save(p)
        )
    head = ml.head_entry(p)
    kept = _segments_possibly_holding_keys(
        head, list(range(350, 360)), "k"
    )
    assert kept == [head["segments"][3]]  # 1 of 4 segments survives
    _v, n = delete_keys(
        spark,
        p,
        spark.range(350, 360).select(F.col("id").alias("k")),
        "k",
        encryption_key=KEY,
    )
    assert n == 10
    assert snapshot_read(spark, p, columns=["k"]).count() == 390
    assert (
        snapshot_read(spark, p, encryption_key=KEY)
        .filter(F.col("k").between(350, 359))
        .count()
        == 0
    )


def test_column_encrypted_streaming_tail(spark, tmp_path):
    """The streaming tail over a COLUMN-encrypted table decrypts with
    the same wrap key as batch reads; keyless streams stay refused."""
    from argodb_mapreduce_spark.sources.python_datasource import (
        FORMAT_NAME,
    )

    p = _col_encrypted_table(spark, tmp_path)
    with pytest.raises(Exception, match="encryptionKey"):
        (
            spark.readStream.format(FORMAT_NAME)
            .load(p)
            .writeStream.format("memory")
            .queryName("colenc_keyless_sink")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    s = (
        spark.readStream.format(FORMAT_NAME)
        .option("encryptionKey", KEY)
        .load(p)
    )
    agg = s.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("ssn") == "pii-7").cast("long")).alias("n_hit"),
    )
    sink = "colenc_stream_sink"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    row = spark.table(sink).first()
    assert row["n"] == 100 and row["n_hit"] == 1


def test_encrypted_vacuum_after_compact(spark, tmp_path):
    """VACUUM on an encrypted table is pure filesystem metadata (no
    column-chunk access), so it composes with both full and COLUMN
    encryption: post-OPTIMIZE, old segments physically leave disk and
    every read path keeps working."""
    from argodb_mapreduce_spark.sources import manifest_log as ml
    from argodb_mapreduce_spark.sources.versioned import compact, vacuum

    p = _col_encrypted_table(spark, tmp_path)
    old_segs = list(ml.head_entry(p)["segments"])
    compact(spark, p, flatten=True, encryption_key=KEY)
    removed = vacuum(p, keep_versions=1)
    assert removed  # the pre-compact segments are gone
    for seg in old_segs:
        assert not os.path.exists(os.path.join(p, seg))
    assert snapshot_read(spark, p, columns=["k", "grp"]).count() == 100
    assert snapshot_read(spark, p, encryption_key=KEY).count() == 100


def test_rotation_mid_stream_tail_survives(spark, tmp_path):
    """A LONG-LIVED streaming tail planned before a rotation keeps
    consuming after it: the stream decrypts with the table KEK, which
    rotation never changes — only the master's wrap moves. New data
    appended under the NEW master lands in the same tail."""
    from argodb_mapreduce_spark.sources.python_datasource import (
        FORMAT_NAME,
    )
    from argodb_mapreduce_spark.sources.versioned import (
        rotate_encryption_key,
    )

    import time as _t

    p = _encrypted_table(spark, tmp_path)
    # a CONTINUOUSLY-RUNNING query: its streamReader (and the KEK it
    # resolved from the old master at plan time) persists across
    # micro-batches
    s = (
        spark.readStream.format(FORMAT_NAME)
        .option("encryptionKey", KEY)
        .load(p)
    )
    sink = "rot_midstream_sink"
    q = (
        s.writeStream.format("memory")
        .queryName(sink)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = _t.time() + 60
        while spark.table(sink).count() < 150 and _t.time() < deadline:
            _t.sleep(0.5)
        assert spark.table(sink).count() == 150
        # rotate MID-STREAM, then append under the NEW master
        rotate_encryption_key(p, KEY, NEW)
        (
            spark.range(150, 170)
            .select(
                F.col("id").alias("k"),
                (F.col("id") % 5).alias("grp"),
                F.lit("z").alias("s"),
            )
            .write.format(FORMAT_NAME)
            .option("encryptionKey", NEW)
            .mode("append")
            .save(p)
        )
        # the live tail keeps consuming: the KEK never changed, so
        # post-rotation files decrypt in the SAME running query even
        # though the master it was started with is now dead
        deadline = _t.time() + 60
        while spark.table(sink).count() < 170 and _t.time() < deadline:
            _t.sleep(0.5)
        assert spark.table(sink).count() == 170
    finally:
        q.stop()
    # a RESTARTED or fresh stream under the old master is refused at
    # plan time — restart semantics match batch: only the current
    # master plans new queries
    with pytest.raises(Exception, match="ROTATED"):
        (
            s.writeStream.format("memory")
            .queryName("rot_midstream_dead")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )


# --- pyds `columns` projection option (r14): explicit projection for a
# --- format with no Spark-side pushdown; the keyless door into
# --- column-encrypted tables through spark.read.format(...)


def _pyds_table(spark, tmp_path, name="proj", **write_opts):
    from argodb_mapreduce_spark.sources.python_datasource import (
        FORMAT_NAME,
        register_datasource,
    )

    register_datasource(spark)
    p = str(tmp_path / name)
    w = (
        spark.range(0, 50)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 3).alias("g"),
            F.concat(F.lit("s"), F.col("id")).alias("s"),
        )
        .write.format(FORMAT_NAME)
        .mode("append")
    )
    for opt, val in write_opts.items():
        w = w.option(opt, val)
    w.save(p)
    return p


def test_pyds_columns_projection_plain(spark, tmp_path):
    from argodb_mapreduce_spark.sources.python_datasource import FORMAT_NAME

    p = _pyds_table(spark, tmp_path)
    r = spark.read.format(FORMAT_NAME).option("columns", "k,g").load(p)
    assert r.columns == ["k", "g"] and r.count() == 50
    assert r.agg(F.sum("k")).first()[0] == sum(range(50))
    with pytest.raises(Exception, match="not in the table schema"):
        (
            spark.read.format(FORMAT_NAME)
            .option("columns", "nope")
            .load(p)
            .count()
        )


def test_pyds_columns_projection_column_encrypted(spark, tmp_path):
    from argodb_mapreduce_spark.sources.python_datasource import FORMAT_NAME

    p = _pyds_table(
        spark,
        tmp_path,
        name="projenc",
        encryptionKey=KEY,
        encryptColumns="s",
    )
    r = spark.read.format(FORMAT_NAME).option("columns", "k,g").load(p)
    assert r.count() == 50 and r.agg(F.sum("k")).first()[0] == sum(range(50))
    with pytest.raises(Exception, match="COLUMN-encrypted"):
        spark.read.format(FORMAT_NAME).load(p).count()
    with pytest.raises(Exception, match="encrypted"):
        (
            spark.read.format(FORMAT_NAME)
            .option("columns", "k,s")
            .load(p)
            .count()
        )
    keyed = (
        spark.read.format(FORMAT_NAME)
        .option("encryptionKey", KEY)
        .option("columns", "s,k")
        .load(p)
    )
    assert keyed.columns == ["s", "k"]
    assert keyed.filter(F.col("s") == "s7").count() == 1


def test_pyds_columns_projection_partitioned_with_dv(spark, tmp_path):
    from argodb_mapreduce_spark.sources.python_datasource import FORMAT_NAME

    p = _pyds_table(spark, tmp_path, name="projpart", partitionBy="g")
    delete_keys(
        spark, p, spark.range(0, 5).select(F.col("id").alias("k")), "k"
    )
    # partition-only projection: zero parquet bytes decoded
    gonly = spark.read.format(FORMAT_NAME).option("columns", "g").load(p)
    assert gonly.columns == ["g"] and gonly.count() == 45
    r = spark.read.format(FORMAT_NAME).option("columns", "k,g").load(p)
    assert r.count() == 45
    assert r.agg(F.sum("k")).first()[0] == sum(range(5, 50))


def test_pyds_columns_projection_after_rename(spark, tmp_path):
    """Projection speaks LOGICAL names on a column-mapped table; the
    reader translates to physical file names per batch."""
    from argodb_mapreduce_spark.sources.python_datasource import FORMAT_NAME
    from argodb_mapreduce_spark.sources.versioned import rename_column

    p = _pyds_table(spark, tmp_path, name="projmap")
    rename_column(p, "s", "label")
    r = (
        spark.read.format(FORMAT_NAME)
        .option("columns", "label,k")
        .load(p)
    )
    assert r.columns == ["label", "k"]
    assert r.filter(F.col("label") == "s7").count() == 1
    with pytest.raises(Exception, match="not in the table schema"):
        (
            spark.read.format(FORMAT_NAME)
            .option("columns", "s")
            .load(p)
            .count()
        )
