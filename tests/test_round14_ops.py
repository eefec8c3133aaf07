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
