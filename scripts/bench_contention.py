"""Commit-lock contention bench: N threads hammering ONE versioned
table. Two workloads:

- append: full versioned_write commits (real parquet write + stats
  phase + locked metadata window) — the r10 measurement, repeatable.
- dml:    concurrent delete_where/update_where/merge_upsert rewrites
  racing blind appends on the same table (VERDICT r10 #4). DML is
  OCC-gated: losers raise ConcurrentWriteError and RETRY against the
  new head, so the metric is committed-ops/s with retries counted.

Every run ends by asserting the gapless-manifest + segments-exist
invariants — the serialization witness.

Usage: python scripts/bench_contention.py [append|dml] [writers ...]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from argodb_mapreduce_spark.session import get_spark  # noqa: E402
from argodb_mapreduce_spark.sources.versioned import (  # noqa: E402
    ConcurrentWriteError,
    _read_manifest,
    delete_where,
    merge_upsert,
    snapshot_read,
    versioned_write,
)


def _invariants(path: str) -> None:
    entries = _read_manifest(path)
    assert [e["version"] for e in entries] == list(range(len(entries)))
    for e in entries:
        for seg in e["segments"]:
            assert os.path.isdir(os.path.join(path, seg)), seg


def bench_append(spark, n_writers: int, appends_each: int = 3) -> dict:
    path = tempfile.mkdtemp(prefix="contend_append_") + "/t"
    versioned_write(spark.range(100).withColumnRenamed("id", "k"), path)

    def writer(i: int) -> int:
        done = 0
        for j in range(appends_each):
            versioned_write(
                spark.range(1000 * i + 10 * j, 1000 * i + 10 * j + 10)
                .withColumnRenamed("id", "k"),
                path,
                mode="append",
            )
            done += 1
        return done

    t0 = time.monotonic()
    with ThreadPoolExecutor(max_workers=n_writers) as ex:
        commits = sum(ex.map(writer, range(n_writers)))
    wall = time.monotonic() - t0
    _invariants(path)
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    return {"writers": n_writers, "commits": commits, "wall_s": round(wall, 2),
            "commits_per_s": round(commits / wall, 1)}


def bench_dml(spark, n_writers: int, ops_each: int = 2, mix: str = "merge") -> dict:
    """Writers loop rewriting-DML + blind appends with OCC-retry (6
    attempts) — the realistic multi-writer shape. Mixes:
    - merge:  merge_upsert racing appends (overlapping-segment rewrites)
    - delete: delete_where racing appends (DV unions under OCC)
    - mixed:  deletes, merges, and appends all racing ONE table — legal
      since r11 (DML composes with pending DVs: merges read through the
      DV and materialize it in rewritten segments)."""
    path = tempfile.mkdtemp(prefix="contend_dml_") + "/t"
    versioned_write(
        spark.range(2000).select(F.col("id").alias("k"), F.lit(0).alias("val")), path
    )

    def one_op(i: int, j: int) -> str:
        kind = (i + j) % (3 if mix == "mixed" else 2)
        for attempt in range(6):
            try:
                if mix == "mixed" and kind == 2:
                    delete_where(spark, path, [("k", "=", 31 * i + 17 * j + attempt)])
                elif kind == 0 and mix in ("merge", "mixed"):
                    src = spark.range(200 * i, 200 * i + 15).select(
                        F.col("id").alias("k"), F.lit(i + 1).alias("val")
                    )
                    merge_upsert(spark, path, src, "k")
                elif kind == 0:
                    delete_where(spark, path, [("k", "=", 7 * i + 13 * j + attempt)])
                else:
                    versioned_write(
                        spark.range(10_000 + 100 * i + 10 * j, 10_000 + 100 * i + 10 * j + 10)
                        .select(F.col("id").alias("k"), F.lit(-1).alias("val")),
                        path, mode="append",
                    )
                return "ok"
            except ConcurrentWriteError:
                continue
        return "gave_up"

    def writer(i: int) -> tuple[int, int]:
        ok = sum(1 for j in range(ops_each) if one_op(i, j) == "ok")
        return ok, ops_each - ok

    t0 = time.monotonic()
    with ThreadPoolExecutor(max_workers=n_writers) as ex:
        results = list(ex.map(writer, range(n_writers)))
    wall = time.monotonic() - t0
    committed = sum(r[0] for r in results)
    gave_up = sum(r[1] for r in results)
    _invariants(path)
    n = snapshot_read(spark, path).count()
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    return {"writers": n_writers, "committed": committed, "gave_up": gave_up,
            "wall_s": round(wall, 2), "ops_per_s": round(committed / wall, 1),
            "final_rows": n}


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "dml"
    writers = [int(w) for w in sys.argv[2:]] or [1, 4, 8]
    spark = get_spark("bench-contention", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    for w in writers:
        if mode == "append":
            print(bench_append(spark, w), flush=True)
        else:
            for mix in ("merge", "delete", "mixed"):
                out = bench_dml(spark, w, mix=mix)
                out["mix"] = mix
                print(out, flush=True)


if __name__ == "__main__":
    main()
