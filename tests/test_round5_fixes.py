"""Round-5 fixes from ADVICE.md, each with the failure it prevents:

* versioned-writer commit protocol — retried/speculative task attempts
  must not leak partial files into the committed version;
* ns->us Arrow cast must truncate (DuckDB/`div 1000` semantics), not
  raise, on sub-microsecond remainders;
* fixture_stale must treat an equal-mtime source as newer (coarse-mtime
  filesystems);
* LSH in-bucket verify must tile the pair matrix (hot-bucket memory);
* z-order grid must survive a constant (degenerate-range) column.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from argodb_mapreduce_spark.catalog import fixture_stale
from argodb_mapreduce_spark.sources.python_datasource import (
    make_versioned_datasource,
    read_versioned,
)


class _FakeTaskContext:
    @staticmethod
    def get():
        class _Ctx:
            def partitionId(self):
                return 0

        return _Ctx()


def _writer(tmp_path):
    ds = make_versioned_datasource()({"path": str(tmp_path)})
    return ds.writer(None, False)


def test_commit_publishes_only_message_files(tmp_path):
    """An orphan staging file (failed/zombie attempt that somehow kept a
    readable file) must NOT be published: commit moves by message."""
    w = _writer(tmp_path)
    staging = tmp_path / w.staging
    staging.mkdir()
    tbl = pa.table({"a": [1, 2]})
    pq.write_table(tbl, staging / "part-00000-winner.parquet")
    pq.write_table(tbl, staging / "part-00000-orphan.parquet")

    class _Msg:
        filename = "part-00000-winner.parquet"

    w.commit([_Msg()])
    seg = tmp_path / "data-0"
    assert sorted(os.listdir(seg)) == ["part-00000-winner.parquet"]
    assert not staging.exists()
    from argodb_mapreduce_spark.sources.manifest_log import read_entries

    entries = read_entries(str(tmp_path))
    assert len(entries) == 1
    assert entries[0]["version"] == 0 and entries[0]["segments"] == ["data-0"]
    # r9: commits also publish footer-harvested min/max stats per segment
    assert set(entries[0].get("stats", {})) <= {"data-0"}


def test_failed_write_attempt_leaves_no_file(tmp_path, monkeypatch):
    """write() must delete its partial parquet on error — otherwise the
    finally-close produces a valid file a later commit could publish."""
    import pyspark

    monkeypatch.setattr(pyspark, "TaskContext", _FakeTaskContext)
    w = _writer(tmp_path)

    def bad_batches():
        yield pa.record_batch([pa.array([1, 2])], names=["a"])
        raise RuntimeError("task died mid-stream")

    with pytest.raises(RuntimeError, match="task died"):
        w.write(bad_batches())
    staging = tmp_path / w.staging
    assert os.listdir(staging) == []


def test_ns_timestamp_submicro_remainder_truncates(tmp_path, spark):
    """A TIMESTAMP(NANOS) value with nonzero sub-us remainder reads back
    truncated (safe cast would raise ArrowInvalid 'would lose data')."""
    seg = tmp_path / "data-0"
    seg.mkdir()
    ns_vals = pa.array([1_000_001_500, 2_500], type=pa.timestamp("ns"))
    pq.write_table(pa.table({"ts": ns_vals}), seg / "part-0.parquet")
    (tmp_path / "_snapshots.json").write_text(
        json.dumps([{"version": 0, "segments": ["data-0"]}])
    )
    rows = read_versioned(spark, str(tmp_path), 0).collect()
    # 1_000_001_500 ns -> 1.000001 s (microsecond == 1); 2_500 ns -> 2 us
    secs = sorted((r["ts"].second, r["ts"].microsecond) for r in rows)
    assert secs == [(0, 2), (1, 1)]


def test_fixture_stale_on_equal_mtime(tmp_path):
    src = tmp_path / "src.parquet"
    marker = tmp_path / "_SUCCESS"
    src.write_text("x")
    marker.write_text("")
    t = os.path.getmtime(src)
    os.utime(marker, (t, t))  # same tick: must still rebuild
    assert fixture_stale(str(src), str(marker))
    os.utime(marker, (t + 2, t + 2))
    assert not fixture_stale(str(src), str(marker))


def test_blocked_bucket_pairs_tile_invariant():
    """Tiny-chunk tiling returns the same pair set and bit-identical
    cosines as one full-matrix pass (chunk >= n)."""
    import numpy as np
    import pandas as pd

    from argodb_mapreduce_spark.operators.similarity import make_bucket_scorer

    rng = np.random.RandomState(7)
    n, d = 23, 8
    pdf = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "qemb": [rng.randint(-100, 100, size=d).astype(np.int64) for _ in range(n)],
    })
    pdf["ss"] = [int((v.astype(object) ** 2).sum()) for v in pdf["qemb"]]

    full = make_bucket_scorer(threshold=-0.5, chunk=64)(pdf)
    tiled = make_bucket_scorer(threshold=-0.5, chunk=3)(pdf)
    key = ["a_id", "b_id"]
    full = full.sort_values(key).reset_index(drop=True)
    tiled = tiled.sort_values(key).reset_index(drop=True)
    assert len(full) > 0
    pd.testing.assert_frame_equal(full, tiled)


def test_zorder_constant_column_yields_cell_zero(spark):
    """mx == mn (constant column) must map to grid cell 0, keeping the
    morton code non-NULL so the layout still clusters on the live axis."""
    from pyspark.sql import functions as F

    from argodb_mapreduce_spark.operators.zorder import morton_code, scale_to_grid

    df = spark.range(5).select(
        F.lit(42.0).alias("const"),
        (F.col("id") * 10.0).alias("live"),
    )
    frame = df.agg(
        F.min("const").alias("c_mn"), F.max("const").alias("c_mx"),
        F.min("live").alias("l_mn"), F.max("live").alias("l_mx"),
    )
    out = (
        df.crossJoin(F.broadcast(frame))
        .select(
            morton_code(
                scale_to_grid(F.col("const"), F.col("c_mn"), F.col("c_mx")),
                scale_to_grid(F.col("live"), F.col("l_mn"), F.col("l_mx")),
            ).alias("z")
        )
        .collect()
    )
    zs = [r["z"] for r in out]
    assert all(z is not None for z in zs)
    assert len(set(zs)) > 1  # live axis still differentiates


def test_bucket_scorer_min_band_emits_pair_once():
    """A pair colliding in several bands must be emitted only by its
    first colliding band, and the union over bands must equal the old
    emit-everywhere set after dedup."""
    import numpy as np
    import pandas as pd

    from argodb_mapreduce_spark.operators.similarity import make_bucket_scorer

    rng = np.random.RandomState(11)
    n, d, n_bands = 17, 8, 4
    base = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "qemb": [rng.randint(-100, 100, size=d).astype(np.int64) for _ in range(n)],
    })
    base["ss"] = [int((v.astype(object) ** 2).sum()) for v in base["qemb"]]
    # Coarse band values force multi-band collisions: band b value is
    # vec_id % (b + 2), so most pairs collide in more than one band.
    bands = np.stack([np.arange(n, dtype=np.int64) % (b + 2) for b in range(n_bands)], axis=1)
    base["bands"] = list(bands)

    scorer = make_bucket_scorer(threshold=-1.1, chunk=5)  # score every pair
    emitted = []
    legacy = []
    for b in range(n_bands):
        for val in np.unique(bands[:, b]):
            bucket = base[bands[:, b] == val].copy()
            bucket["band_id"] = b
            bucket["val"] = int(val)
            emitted.append(scorer(bucket))
            legacy.append(scorer(bucket.drop(columns=["bands", "band_id", "val"])))
    got = pd.concat(emitted, ignore_index=True)
    want = (
        pd.concat(legacy, ignore_index=True)
        .drop_duplicates()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    # exactly once: no duplicates before any dedup
    assert not got.duplicated(["a_id", "b_id"]).any()
    got = got.sort_values(["a_id", "b_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
