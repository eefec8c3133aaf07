"""Versioned-table snapshot semantics (§2.A6 mutable-table seam)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from argodb_mapreduce_spark.catalog import ScanError, snapshot, table_path
from argodb_mapreduce_spark.sources.versioned import (
    snapshot_read,
    versioned_write,
    versions,
)


@pytest.fixture()
def vt(spark, tmp_path):
    path = str(tmp_path / "vt")
    base = spark.range(10).withColumnRenamed("id", "k")
    versioned_write(base, path, mode="append")  # v0: 0..9
    versioned_write(spark.range(10, 15).withColumnRenamed("id", "k"), path, mode="append")  # v1: 0..14
    versioned_write(spark.range(100, 103).withColumnRenamed("id", "k"), path, mode="overwrite")  # v2: 100..102
    return path


def test_versions_recorded(vt):
    assert versions(vt) == [0, 1, 2]


def test_append_accumulates_overwrite_replaces(spark, vt):
    assert snapshot_read(spark, vt, 0).count() == 10
    assert snapshot_read(spark, vt, 1).count() == 15
    assert sorted(r["k"] for r in snapshot_read(spark, vt, 2).collect()) == [100, 101, 102]


def test_old_snapshot_immune_to_later_writes(spark, vt):
    df_v0 = snapshot_read(spark, vt, 0)  # plan pinned at version 0
    versioned_write(spark.range(500, 600).withColumnRenamed("id", "k"), vt, mode="append")
    assert df_v0.count() == 10  # unchanged by the concurrent append
    assert snapshot_read(spark, vt).count() == 103  # latest sees it


def test_latest_is_default(spark, vt):
    assert snapshot_read(spark, vt).count() == snapshot_read(spark, vt, 2).count()


def test_unknown_version_raises(spark, vt):
    with pytest.raises(ValueError, match="unknown version"):
        snapshot_read(spark, vt, 99)


def test_catalog_snapshot_dispatch(spark, vt, sf_dir):
    assert snapshot(spark, vt, 1).count() == 15
    # plain parquet path: identity scan works, version request errors
    plain = table_path(sf_dir, "nation")
    assert snapshot(spark, plain).count() == 25
    with pytest.raises(ScanError, match="not versioned"):
        snapshot(spark, plain, 1)


def test_append_reuses_segments_no_rewrite(spark, vt):
    # v1's manifest references v0's segment rather than copying it: one
    # data dir per version exists, no rewrites.
    from argodb_mapreduce_spark.sources.versioned import _read_manifest

    segs = [d for d in os.listdir(vt) if d.startswith("data-")]
    assert sorted(segs) == ["data-0", "data-1", "data-2"]
    assert _read_manifest(vt)[1]["segments"] == ["data-0", "data-1"]


def test_registered_query_parity(spark, sf_dir):
    from argodb_mapreduce_spark import registry
    from tests.compare import assert_matches

    q = registry.all_queries()["snapshot_time_travel"]
    assert_matches(q.fn(spark, sf_dir), q.oracle, sf_dir, "snapshot_time_travel")


def test_compaction_preserves_data_and_time_travel(spark, vt):
    from argodb_mapreduce_spark.sources.versioned import (
        _read_manifest,
        compact,
        snapshot_read,
        versions,
    )

    before = sorted(r["k"] for r in snapshot_read(spark, vt).collect())
    v = compact(spark, vt)
    assert versions(vt)[-1] == v
    # Compacted read is identical to the pre-compaction latest version.
    assert sorted(r["k"] for r in snapshot_read(spark, vt).collect()) == before
    # Single segment now; provenance recorded.
    entry = _read_manifest(vt)[-1]
    assert len(entry["segments"]) == 1 and entry["compacted_from"] == v - 1
    # Older versions still time-travel to their original contents.
    assert sorted(r["k"] for r in snapshot_read(spark, vt, 0).collect()) == list(range(10))
    assert sorted(r["k"] for r in snapshot_read(spark, vt, 1).collect()) == list(range(15))


def test_rollback_is_manifest_only_and_preserves_history(spark, sf_dir):
    """RESTORE must not rewrite data: no new segment directory appears,
    v3 reads v1's content, and the rolled-over v2 stays readable."""
    import os

    from argodb_mapreduce_spark.sources.versioned import (
        _build_rollback_fixture,
        snapshot_read,
        versions,
    )

    out = _build_rollback_fixture(spark, sf_dir)
    assert versions(out) == [0, 1, 2, 3]
    # manifest-only: the rollback version owns no data-3 segment dir
    assert not os.path.exists(os.path.join(out, "data-3"))
    v1 = snapshot_read(spark, out, 1)
    v3 = snapshot_read(spark, out, 3)
    assert v3.count() == v1.count()
    assert v3.exceptAll(v1).count() == 0
    # the destructive overwrite remains time-travelable after rollback
    v2 = snapshot_read(spark, out, 2)
    assert v2.count() > 0
    assert v2.count() != v1.count()
