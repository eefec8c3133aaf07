"""Round 12: CDF-transparent maintenance, distributed compaction,
generated-column recompute on UPDATE, identity fail-loud guards.

Contract under test (Delta's OPTIMIZE-under-CDF): compact /
compact_binpack / zorder_rewrite commits carry ``data_change: false``;
change_feed and the streaming CDF reader SKIP them (zero legs) instead
of raising, so table maintenance never breaks an incremental consumer.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from argodb_mapreduce_spark.sources.versioned import (
    _read_manifest,
    add_generated_column,
    add_identity_column,
    change_feed,
    change_feed_between_timestamps,
    compact,
    compact_binpack,
    delete_where,
    enable_change_data_feed,
    snapshot_read,
    update_where,
    versioned_write,
    zorder_rewrite,
)


def _base(spark, tmp_path, n=60):
    p = str(tmp_path / "t")
    df = spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).alias("g"),
        (F.col("id") * 10).cast("long").alias("v"),
    )
    versioned_write(df, p, mode="append")
    return p


# ---------------------------------------------------------------- CDF skip


def test_compact_commit_tagged_data_change_false(spark, tmp_path):
    p = _base(spark, tmp_path)
    versioned_write(
        spark.range(60, 80).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).alias("g"),
            (F.col("id") * 10).cast("long").alias("v"),
        ),
        p,
        mode="append",
    )
    compact(spark, p)
    entry = _read_manifest(p)[-1]
    assert entry["data_change"] is False
    assert "compacted_from" in entry


def test_change_feed_skips_compaction(spark, tmp_path):
    """append(v0) -> append(v1) -> compact(v2) -> append(v3): the feed
    over 0..3 emits ONLY v1's and v3's rows as inserts — the compaction
    contributes zero legs and does not break the span."""
    p = _base(spark, tmp_path)  # v0: k 0..59

    def mk(a, b):
        return spark.range(a, b).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).alias("g"),
            (F.col("id") * 10).cast("long").alias("v"),
        )

    versioned_write(mk(60, 70), p, mode="append")  # v1
    compact(spark, p)  # v2: data_change false
    versioned_write(mk(70, 85), p, mode="append")  # v3
    feed = change_feed(spark, p, 0, 3)
    rows = feed.groupBy("_change_type").agg(
        F.count("*").alias("n"), F.sum("k").alias("sk")
    ).collect()
    legs = {r["_change_type"]: (r["n"], r["sk"]) for r in rows}
    # v1: 60..69 (n=10, sum=645); v3: 70..84 (n=15, sum=1155)
    assert legs == {"insert": (25, 645 + 1155)}


def test_change_feed_skips_compaction_that_absorbs_dv(spark, tmp_path):
    """delete(v1, DV) -> compact(v2, absorbs DV) -> append(v3): the
    delete legs come from v1's DV delta only; compaction (which
    physically drops the tombstoned rows) adds nothing."""
    p = _base(spark, tmp_path)
    delete_where(spark, p, [("k", "<", 10)])  # v1: DV
    compact(spark, p)  # v2 absorbs the DV
    assert "dv" not in _read_manifest(p)[-1]
    versioned_write(
        spark.range(100, 105).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).alias("g"),
            (F.col("id") * 10).cast("long").alias("v"),
        ),
        p,
        mode="append",
    )  # v3
    feed = change_feed(spark, p, 0, 3)
    legs = {
        r["_change_type"]: r["n"]
        for r in feed.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    }
    assert legs == {"delete": 10, "insert": 5}


def test_change_feed_skips_binpack_and_zorder(spark, tmp_path):
    p = _base(spark, tmp_path)
    versioned_write(
        spark.range(60, 62).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).alias("g"),
            (F.col("id") * 10).cast("long").alias("v"),
        ),
        p,
        mode="append",
    )  # v1
    compact_binpack(spark, p, target_bytes=1 << 30)  # v2: packs everything
    assert _read_manifest(p)[-1]["data_change"] is False
    zorder_rewrite(spark, p, "k", "v", n_segments=2)  # v3
    assert _read_manifest(p)[-1]["data_change"] is False
    feed = change_feed(spark, p, 0, 3)
    legs = {
        r["_change_type"]: r["n"]
        for r in feed.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    }
    assert legs == {"insert": 2}  # only v1's two rows; maintenance silent


def test_change_feed_window_of_only_maintenance_is_empty(spark, tmp_path):
    p = _base(spark, tmp_path)
    versioned_write(
        spark.range(60, 61).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).alias("g"),
            (F.col("id") * 10).cast("long").alias("v"),
        ),
        p,
        mode="append",
    )  # v1
    compact(spark, p)  # v2
    feed = change_feed(spark, p, 1, 2)  # span holds ONLY the compaction
    assert feed.count() == 0
    assert "_change_type" in feed.columns


def test_overwrite_still_raises_in_feed(spark, tmp_path):
    p = _base(spark, tmp_path)
    versioned_write(
        spark.range(0, 5).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).alias("g"),
            (F.col("id") * 10).cast("long").alias("v"),
        ),
        p,
        mode="overwrite",
    )
    with pytest.raises(ValueError, match="change feed undefined"):
        change_feed(spark, p, 0, 1).collect()


def test_streaming_cdf_skips_compaction(spark, tmp_path):
    """The pyds streaming reader drains an append/compact/append/delete
    history green: compaction contributes zero partitions; the delete's
    positions resolve inside the COMPACTED file."""
    from argodb_mapreduce_spark.sources.python_datasource import (
        FORMAT_NAME,
        register_datasource,
    )

    register_datasource(spark)
    p = _base(spark, tmp_path)  # v0: k 0..59
    compact(spark, p)  # v1
    versioned_write(
        spark.range(60, 70).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).alias("g"),
            (F.col("id") * 10).cast("long").alias("v"),
        ),
        p,
        mode="append",
    )  # v2
    delete_where(spark, p, [("k", "<", 5)])  # v3: DV inside compacted file
    s = (
        spark.readStream.format(FORMAT_NAME)
        .option("readChangeFeed", "true")
        .load(p)
    )
    sink = "r12_stream_cdf_opt"
    q = (
        s.groupBy("_change_type")
        .agg(F.count("*").alias("n"), F.sum("k").alias("sk"))
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    legs = {
        r["_change_type"]: (r["n"], r["sk"]) for r in spark.table(sink).collect()
    }
    assert legs == {"insert": (70, sum(range(70))), "delete": (5, 10)}


def test_streaming_plain_tail_skips_compaction(spark, tmp_path):
    """Even WITHOUT readChangeFeed, the append-tail stream must skip a
    data_change:false commit (re-emitting the compacted segment would
    duplicate every absorbed row) instead of raising non-append."""
    from argodb_mapreduce_spark.sources.python_datasource import (
        FORMAT_NAME,
        register_datasource,
    )

    register_datasource(spark)
    p = _base(spark, tmp_path)  # v0
    compact(spark, p)  # v1
    versioned_write(
        spark.range(60, 64).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).alias("g"),
            (F.col("id") * 10).cast("long").alias("v"),
        ),
        p,
        mode="append",
    )  # v2
    s = spark.readStream.format(FORMAT_NAME).load(p)
    sink = "r12_stream_tail_opt"
    q = (
        s.groupBy()
        .agg(F.count("*").alias("n"), F.sum("k").alias("sk"))
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    row = spark.table(sink).collect()[0]
    assert (row["n"], row["sk"]) == (64, sum(range(64)))


def test_cdf_between_timestamps_initial_snapshot_respects_dv(spark, tmp_path):
    """ADVICE fix: a window reaching the oldest retained entry reads it
    as the DV-masked live snapshot — tombstoned rows must not come back
    as insert legs."""
    p = _base(spark, tmp_path)  # v0
    delete_where(spark, p, [("k", ">=", 50)])  # v1: DV on v0's file
    from argodb_mapreduce_spark.sources.versioned import vacuum

    vacuum(p, keep_versions=1)  # v1 (dv-carrying) becomes entries[0]
    entries = _read_manifest(p)
    assert entries[0].get("dv")
    ts = entries[0]["ts"]
    feed = change_feed_between_timestamps(spark, p, ts - 1, ts + 1)
    legs = {
        r["_change_type"]: r["n"]
        for r in feed.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    }
    assert legs == {"insert": 50}  # 0..49 live; 50..59 never resurrect


# ------------------------------------------------- distributed compaction


def test_compact_write_parallelism_is_byte_derived(spark, tmp_path):
    """With a tiny target_file_mb the staged rewrite must produce
    MULTIPLE files (multi-task write), proving the single-task
    coalesce(1) funnel is gone; data stays byte-equal."""
    p = str(tmp_path / "t")
    df = spark.range(0, 200_000).select(
        F.col("id").alias("k"), F.rand(7).alias("x")
    )
    versioned_write(df, p, mode="append")
    before = snapshot_read(spark, p).agg(F.sum("k")).collect()[0][0]
    total = sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(p, "data-0", "*.parquet"))
    )
    target_mb = total / 3 / (1024 * 1024)  # want >= 3 output files
    compact(spark, p, target_file_mb=target_mb)
    seg = _read_manifest(p)[-1]["segments"][0]
    files = glob.glob(os.path.join(p, seg, "*.parquet"))
    assert len(files) >= 3
    assert snapshot_read(spark, p).agg(F.sum("k")).collect()[0][0] == before


def test_compact_partitioned_keeps_one_file_per_dir(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.range(0, 3000).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("g")
    )
    versioned_write(df.repartition(6), p, mode="append", partition_by=["g"])
    versioned_write(df.repartition(6), p, mode="append", partition_by=["g"])
    compact(spark, p, target_file_mb=0.0001)  # force want >> 1
    entry = _read_manifest(p)[-1]
    seg = entry["segments"][0]
    assert entry["partition_by"][seg] == ["g"]
    for d in glob.glob(os.path.join(p, seg, "g=*")):
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1
    assert snapshot_read(spark, p).count() == 6000


# ------------------------------------- generated-column recompute on UPDATE


def test_update_recomputes_generated_column(spark, tmp_path):
    p = str(tmp_path / "t")
    os.makedirs(p, exist_ok=True)
    add_generated_column(spark, p, "k2", "k * 2")
    versioned_write(
        spark.range(0, 20).select(F.col("id").alias("k")), p, mode="append"
    )
    # SET k touches k2's source: k2 must be re-derived, not trip the CHECK
    s = update_where(spark, p, [("k", "<", 5)], {"k": F.col("k") + 100})
    assert s["rows_updated"] == 5
    bad = snapshot_read(spark, p).filter(F.col("k2") != F.col("k") * 2).count()
    assert bad == 0


def test_update_recomputes_generated_column_cdf_path(spark, tmp_path):
    p = str(tmp_path / "t")
    os.makedirs(p, exist_ok=True)
    add_generated_column(spark, p, "k2", "k * 2")
    versioned_write(
        spark.range(0, 20).select(F.col("id").alias("k")), p, mode="append"
    )
    enable_change_data_feed(p)
    update_where(spark, p, [("k", "<", 5)], {"k": F.col("k") + 100})
    bad = snapshot_read(spark, p).filter(F.col("k2") != F.col("k") * 2).count()
    assert bad == 0
    post = change_feed(spark, p, 0, 1).filter(
        F.col("_change_type") == "update_postimage"
    )
    assert post.filter(F.col("k2") != F.col("k") * 2).count() == 0


def test_update_explicit_set_of_generated_column_still_checked(spark, tmp_path):
    p = str(tmp_path / "t")
    os.makedirs(p, exist_ok=True)
    add_generated_column(spark, p, "k2", "k * 2")
    versioned_write(
        spark.range(0, 10).select(F.col("id").alias("k")), p, mode="append"
    )
    from argodb_mapreduce_spark.sources.versioned import ConstraintViolation

    with pytest.raises(ConstraintViolation):
        update_where(spark, p, [("k", "<", 3)], {"k2": F.lit(999)})


# -------------------------------------------------- identity fail-loud


def test_identity_registration_is_atomic_under_lock(spark, tmp_path):
    p = str(tmp_path / "t")
    os.makedirs(p, exist_ok=True)
    add_identity_column(p, "id_a", start=1)
    add_identity_column(p, "id_b", start=100)
    from argodb_mapreduce_spark.sources.versioned import _read_properties

    ident = _read_properties(p)["identity"]
    assert set(ident) == {"id_a", "id_b"}
    with pytest.raises(ValueError, match="already defined"):
        add_identity_column(p, "id_a")


def test_identity_base_fails_loud_without_stats(spark, tmp_path):
    """A head whose schema ledger HOLDS the identity column but records
    no max stat must refuse allocation (silent restart => duplicates)."""
    p = str(tmp_path / "t")
    os.makedirs(p, exist_ok=True)
    add_identity_column(p, "rid", start=1)
    versioned_write(
        spark.range(0, 10).select(F.col("id").alias("k")), p, mode="append"
    )
    import json

    mpath = os.path.join(p, "_snapshots.json")
    with open(mpath) as f:
        entries = json.load(f)
    for st in entries[-1]["stats"].values():
        st.pop("rid", None)  # simulate a stats-less row group poisoning rid
    with open(mpath, "w") as f:
        json.dump(entries, f)
    with pytest.raises(ValueError, match="no segment records a max stat"):
        versioned_write(
            spark.range(10, 20).select(F.col("id").alias("k")), p, mode="append"
        )


# -------------------------------------------- DV sidecars + pruned deletes


def test_dv_sidecar_multifile_and_reads_back(spark, tmp_path):
    """The DV write is no longer a single-task coalesce(1): a broad
    delete's sidecar may span multiple files and the reader (a
    directory read) masks correctly either way."""
    p = str(tmp_path / "t")
    df = spark.range(0, 50_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("g")
    )
    versioned_write(df.repartition(8), p, mode="append")
    delete_where(spark, p, [("g", "=", 3)])
    dv_name = _read_manifest(p)[-1]["dv"]
    files = glob.glob(os.path.join(p, dv_name, "*.parquet"))
    assert len(files) >= 1  # size-aware: small DV may still be 1 file
    live = snapshot_read(spark, p)
    assert live.filter(F.col("g") == 3).count() == 0
    assert live.count() == 50_000 - df.filter(F.col("g") == 3).count()


def test_delete_keys_prunes_segments_by_minmax(spark, tmp_path):
    p = str(tmp_path / "t")

    def mk(a, b):
        return spark.range(a, b).select(F.col("id").alias("k"))

    versioned_write(mk(0, 100), p, mode="append")
    versioned_write(mk(100, 200), p, mode="append")
    versioned_write(mk(200, 300), p, mode="append")
    from argodb_mapreduce_spark.sources.versioned import (
        _segments_possibly_holding_keys,
        delete_keys,
    )

    latest = _read_manifest(p)[-1]
    kept = _segments_possibly_holding_keys(latest, [150, 160], "k")
    assert kept == ["data-1"]
    v, n = delete_keys(spark, p, mk(150, 160), "k")
    assert n == 10
    assert snapshot_read(spark, p).count() == 290
    # keys provably in NO segment: no-op without a commit
    v2, n2 = delete_keys(spark, p, mk(5000, 5010), "k")
    assert (v2, n2) == (v, 0)


def test_delete_keys_prunes_segments_by_bloom(spark, tmp_path):
    """Overlapping ranges (min/max can't prune) but disjoint key SETS:
    the tracked bloom must exclude the untouched segment."""
    p = str(tmp_path / "t")
    evens = spark.range(0, 500).select((F.col("id") * 2).alias("k"))
    odds = spark.range(0, 500).select((F.col("id") * 2 + 1).alias("k"))
    versioned_write(evens, p, mode="append", bloom_columns=["k"])
    versioned_write(odds, p, mode="append", bloom_columns=["k"])
    from argodb_mapreduce_spark.sources.versioned import (
        _segments_possibly_holding_keys,
        delete_keys,
    )

    latest = _read_manifest(p)[-1]
    kept = _segments_possibly_holding_keys(latest, [11, 33, 55], "k")
    assert kept == ["data-1"]  # evens segment bloom-rejected
    v, n = delete_keys(
        spark, p, spark.createDataFrame([(11,), (33,), (55,)], ["k"]), "k"
    )
    assert n == 3
    assert snapshot_read(spark, p).count() == 997


def test_delete_keys_over_cap_falls_back_to_full_scan(spark, tmp_path):
    import argodb_mapreduce_spark.sources.versioned as V

    p = str(tmp_path / "t")
    versioned_write(
        spark.range(0, 1000).select(F.col("id").alias("k")), p, mode="append"
    )
    old = V._DELETE_KEYS_PRUNE_CAP
    V._DELETE_KEYS_PRUNE_CAP = 5  # force the over-cap path
    try:
        v, n = V.delete_keys(
            spark,
            p,
            spark.range(0, 50).select(F.col("id").alias("k")),
            "k",
        )
    finally:
        V._DELETE_KEYS_PRUNE_CAP = old
    assert n == 50
    assert snapshot_read(spark, p).count() == 950
