"""1x/10x ladders for the round-11b surfaces.

Self-contained (builds its own stores under /tmp), best-of-2 per cell:

- cdf_update_lifecycle: 10-segment store, CDF-enabled UPDATE touching
  ONE segment, then change_feed over the update — x10 grows the TABLE
  10x while the touched window stays fixed, so the whole lifecycle
  should stay near-flat (rewrite O(touched segment), feed O(changes)).
- rowgroup_skip: one key-sorted multi-row-group file; a fixed 1k-key
  window read through the pyds pruned path vs the unpruned full scan —
  the pruned wall should stay near-flat at 10x while the full scan
  grows.
- optimized_write: 32-shard append with and without target_file_mb —
  measures the write-time right-sizing overhead (expected ~2x the
  plain write at any scale: one extra pass over the new bytes).

Usage: python scripts/bench_r11b.py [--ops a,b,c]
Prints one JSON line per cell; record results in SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from argodb_mapreduce_spark.session import get_spark  # noqa: E402

BASE_ROWS = 200_000


def _rows(spark, n, shift=0):
    return spark.range(shift, shift + n).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("g"),
        (F.col("id") * 3).alias("v"),
    )


def cdf_update_lifecycle(spark, scale):
    from argodb_mapreduce_spark.sources.versioned import (
        change_feed,
        enable_change_data_feed,
        update_where,
        versioned_write,
    )

    n = BASE_ROWS * scale
    p = f"/tmp/r11b_cdfu_x{scale}"
    shutil.rmtree(p, ignore_errors=True)
    seg = n // 10
    for i in range(10):  # 10 key-ranged segments
        versioned_write(_rows(spark, seg, shift=i * seg), p, mode="append")
    enable_change_data_feed(p)
    t0 = time.monotonic()
    update_where(spark, p, [("k", "<", 2000)], {"v": F.lit(0).cast("long")})
    n_feed = change_feed(spark, p, 9, 10).count()
    dt = time.monotonic() - t0
    assert n_feed == 4000, n_feed
    return dt


def rowgroup_skip(spark, scale):
    from argodb_mapreduce_spark.sources.python_datasource import read_versioned
    from argodb_mapreduce_spark.sources.versioned import versioned_write

    n = 1_000_000 * scale  # big enough that batch decode dominates
    p = f"/tmp/r11b_rg_x{scale}"
    shutil.rmtree(p, ignore_errors=True)
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    old = hc.get("parquet.block.size")
    hc.set("parquet.block.size", str(256 * 1024))
    try:
        versioned_write(_rows(spark, n).orderBy("k").coalesce(1), p)
    finally:
        hc.unset("parquet.block.size") if old is None else hc.set(
            "parquet.block.size", old
        )
    preds = [("k", ">=", 1000), ("k", "<", 2000)]
    t0 = time.monotonic()
    s_pruned = (
        read_versioned(spark, p, predicates=preds).agg(F.sum("v")).collect()[0][0]
    )
    t_pruned = time.monotonic() - t0
    assert s_pruned == sum(i * 3 for i in range(1000, 2000))
    t0 = time.monotonic()
    s_full = read_versioned(spark, p).agg(F.sum("v")).collect()[0][0]
    t_full = time.monotonic() - t0
    assert s_full == 3 * n * (n - 1) // 2
    return {"pruned": t_pruned, "full": t_full}


def optimized_write(spark, scale):
    from argodb_mapreduce_spark.sources.versioned import versioned_write

    n = BASE_ROWS * scale
    df = _rows(spark, n).repartition(32)
    df.count()  # materialize the shuffle outside the timed region
    p1, p2 = f"/tmp/r11b_ow_plain_x{scale}", f"/tmp/r11b_ow_opt_x{scale}"
    shutil.rmtree(p1, ignore_errors=True)
    shutil.rmtree(p2, ignore_errors=True)
    t0 = time.monotonic()
    versioned_write(df, p1, mode="append")
    t_plain = time.monotonic() - t0
    t0 = time.monotonic()
    versioned_write(df, p2, mode="append", target_file_mb=64)
    t_opt = time.monotonic() - t0
    return {"plain": t_plain, "optimized": t_opt}


def delete_keys_erase(spark, scale):
    """Fixed K=500 erase batch against a growing table: the sidecar is
    O(K) but discovery is a key-projected scan — expect sub-linear
    growth (column pruning + broadcast semi-join), not flatness."""
    from argodb_mapreduce_spark.sources.versioned import delete_keys, versioned_write

    n = BASE_ROWS * scale
    p = f"/tmp/r11b_dk_x{scale}"
    shutil.rmtree(p, ignore_errors=True)
    versioned_write(_rows(spark, n), p)
    keys = spark.range(0, 500).withColumnRenamed("id", "k")
    t0 = time.monotonic()
    v, erased = delete_keys(spark, p, keys, "k")
    dt = time.monotonic() - t0
    assert erased == 500
    return dt


def medallion_day(spark, scale):
    """One FIXED-SIZE ingest day through bronze->silver->gold on a base
    that is 1x vs 10x: the day's cost must not grow with history."""
    from argodb_mapreduce_spark.operators.materialized_view import (
        mv_create,
        mv_refresh,
    )
    from argodb_mapreduce_spark.sources.versioned import (
        add_constraint,
        change_feed,
        enable_change_data_feed,
        snapshot_read,
        versioned_write,
        versioned_write_expect,
    )
    import os as _o

    n = BASE_ROWS * scale
    bronze = f"/tmp/r11b_med_b_x{scale}"
    silver = f"/tmp/r11b_med_s_x{scale}"
    gold = f"/tmp/r11b_med_g_x{scale}"
    for p in (bronze, bronze + "_quarantine", silver, gold):
        shutil.rmtree(p, ignore_errors=True)
    _o.makedirs(bronze)
    add_constraint(spark, bronze, "v_nonneg", "v >= 0")
    versioned_write_expect(_rows(spark, n), bronze)  # history: 1x vs 10x
    enable_change_data_feed(bronze)
    versioned_write(
        snapshot_read(spark, bronze, 0).select("k", "g", "v"), silver
    )
    mv_create(spark, silver, gold, ["g"], ["v"])
    day = _rows(spark, 20_000, shift=n)  # FIXED day size at both scales
    t0 = time.monotonic()
    r = versioned_write_expect(day, bronze)
    delta = change_feed(spark, bronze, 0, r["version"]).filter(
        F.col("_change_type") == "insert"
    )
    versioned_write(delta.select("k", "g", "v"), silver, mode="append")
    res = mv_refresh(spark, gold)
    dt = time.monotonic() - t0
    assert res["mode"] == "incremental"
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", default="cdf_update_lifecycle,rowgroup_skip,optimized_write")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    spark = get_spark("bench-r11b", cpus=8)
    for name in args.ops.split(","):
        fn = globals()[name]
        out = {"op": name}
        for scale, tag in ((1, "x1"), (10, "x10")):
            best = None
            for _ in range(args.reps):
                r = fn(spark, scale)
                if isinstance(r, dict):
                    best = (
                        r
                        if best is None
                        else {k: min(best[k], r[k]) for k in r}
                    )
                else:
                    best = r if best is None else min(best, r)
            out[tag] = best
        if isinstance(out["x1"], dict):
            out["ratio"] = {
                k: round(out["x10"][k] / out["x1"][k], 2) for k in out["x1"]
            }
        else:
            out["ratio"] = round(out["x10"] / out["x1"], 2)
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
