"""1x/10x ladders for the round-14 surfaces.

Self-contained (builds its own stores under /tmp), best-of-2 per cell:

- pyds_mapping_write: pyds append onto a table with an active column
  mapping (post-RENAME) vs onto an unmapped table — the writer's
  plan-time mapping resolution + per-batch zero-copy renames should be
  O(columns) constant, so the mapped/unmapped ratio stays ~1 at any
  scale (VERDICT r13 ask #8).
- keyed_read: keyed pyarrow snapshot_read of an encrypted table vs the
  native JVM read of the same data plaintext — bounds the cipher+Arrow
  overhead per byte; both sides should scale ~linearly with data.
- encrypted_erase: fixed K=500 delete_keys against a growing ENCRYPTED
  table — the keyed scan term grows with bytes, the DV sidecar stays
  O(K); compare against the plaintext erase ladder (r11b: flat).
- uncdc_update_feed: UPDATE (no CDC enabled) touching ONE of 10
  key-ranged segments + change_feed over the update, table grows 10x
  while the touched window stays fixed — the synthesized file-level
  legs are O(rewritten segment), so the lifecycle should stay
  near-flat like the r11b CDF-sidecar twin.

Usage: python scripts/bench_r14.py [--ops a,b,c]
Prints one JSON line per cell; record results in SCALING.md.
"""

from __future__ import annotations

import argparse
import base64
import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from argodb_mapreduce_spark.session import get_spark  # noqa: E402

BASE_ROWS = 200_000
KEY = base64.b64encode(bytes(range(32))).decode()


def _rows(spark, n, shift=0):
    return spark.range(shift, shift + n).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("g"),
        (F.col("id") * 3).alias("v"),
    )


def _pyds(spark):
    from argodb_mapreduce_spark.sources.python_datasource import (
        FORMAT_NAME,
        register_datasource,
    )

    register_datasource(spark)
    return FORMAT_NAME


def pyds_mapping_write(spark, scale):
    from argodb_mapreduce_spark.sources.versioned import (
        rename_column,
        versioned_write,
    )

    fmt = _pyds(spark)
    n = BASE_ROWS * scale
    out = {}
    for tag in ("plain", "mapped"):
        p = f"/tmp/bench_r14_mapwrite_{tag}_{scale}"
        shutil.rmtree(p, ignore_errors=True)
        versioned_write(_rows(spark, 1000), p, mode="append")
        if tag == "mapped":
            rename_column(p, "v", "val")
        df = _rows(spark, n).withColumnRenamed("v", "val" if tag == "mapped" else "v")
        t0 = time.time()
        df.write.format(fmt).mode("append").save(p)
        out[tag] = time.time() - t0
        shutil.rmtree(p, ignore_errors=True)
    return out


def keyed_read(spark, scale):
    from argodb_mapreduce_spark.sources.versioned import snapshot_read

    fmt = _pyds(spark)
    n = BASE_ROWS * scale
    out = {}
    enc = f"/tmp/bench_r14_keyedread_enc_{scale}"
    pl = f"/tmp/bench_r14_keyedread_pl_{scale}"
    for p in (enc, pl):
        shutil.rmtree(p, ignore_errors=True)
    w = _rows(spark, n).write.format(fmt).mode("append")
    w.option("encryptionKey", KEY).save(enc)
    from argodb_mapreduce_spark.sources.versioned import versioned_write

    versioned_write(_rows(spark, n), pl, mode="append")
    for tag, fn in (
        ("keyed", lambda: snapshot_read(spark, enc, encryption_key=KEY)),
        ("native", lambda: snapshot_read(spark, pl)),
    ):
        best = None
        for _ in range(2):
            t0 = time.time()
            assert fn().agg(F.sum("v")).first()[0] is not None
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[tag] = best
    for p in (enc, pl):
        shutil.rmtree(p, ignore_errors=True)
    return out


def encrypted_erase(spark, scale):
    from argodb_mapreduce_spark.sources.versioned import delete_keys

    fmt = _pyds(spark)
    n = BASE_ROWS * scale
    p = f"/tmp/bench_r14_encerase_{scale}"
    shutil.rmtree(p, ignore_errors=True)
    _rows(spark, n).write.format(fmt).mode("append").option(
        "encryptionKey", KEY
    ).save(p)
    keys = spark.range(0, n, max(1, n // 500)).select(F.col("id").alias("k"))
    t0 = time.time()
    _v, erased = delete_keys(spark, p, keys, "k", encryption_key=KEY)
    dt = time.time() - t0
    shutil.rmtree(p, ignore_errors=True)
    return {"erase": dt, "rows_erased": erased}


def uncdc_update_feed(spark, scale):
    from argodb_mapreduce_spark.sources.versioned import (
        change_feed,
        update_where,
        versioned_write,
    )

    n = BASE_ROWS * scale
    p = f"/tmp/bench_r14_uncdc_{scale}"
    shutil.rmtree(p, ignore_errors=True)
    seg = n // 10
    for i in range(10):
        versioned_write(_rows(spark, seg, shift=i * seg), p, mode="append")
    # Fixed-size touched window: the FIRST segment's key range at x1
    # size, regardless of scale.
    hi = BASE_ROWS // 10
    t0 = time.time()
    res = update_where(spark, p, [("k", "<", hi)], {"g": F.lit(99).cast("bigint")})
    n_legs = (
        change_feed(spark, p, 9, res["version"])
        .groupBy("_change_type")
        .count()
        .count()
    )
    dt = time.time() - t0
    shutil.rmtree(p, ignore_errors=True)
    return {
        "update_plus_feed": dt,
        "segments_rewritten": res["segments_rewritten"],
        "leg_types": n_legs,
    }


def column_encrypted_read(spark, scale):
    """Keyless plaintext-subset scan of a COLUMN-encrypted table vs the
    keyed full read of the same table vs a native plaintext twin: the
    keyless subset should track the keyed cost minus cipher work, and
    both should scale linearly like the native read."""
    from argodb_mapreduce_spark.sources.versioned import (
        snapshot_read,
        versioned_write,
    )

    fmt = _pyds(spark)
    n = BASE_ROWS * scale
    enc = f"/tmp/bench_r14_colenc_{scale}"
    pl = f"/tmp/bench_r14_colenc_pl_{scale}"
    for p in (enc, pl):
        shutil.rmtree(p, ignore_errors=True)
    (
        _rows(spark, n)
        .write.format(fmt)
        .mode("append")
        .option("encryptionKey", KEY)
        .option("encryptColumns", "v")
        .save(enc)
    )
    versioned_write(_rows(spark, n), pl, mode="append")
    out = {}
    for tag, fn in (
        (
            "keyless_subset",
            lambda: snapshot_read(spark, enc, columns=["k", "g"]).agg(
                F.sum("k")
            ),
        ),
        (
            "keyed_full",
            lambda: snapshot_read(spark, enc, encryption_key=KEY).agg(
                F.sum("v")
            ),
        ),
        ("native_plain", lambda: snapshot_read(spark, pl).agg(F.sum("v"))),
    ):
        best = None
        for _ in range(2):
            t0 = time.time()
            assert fn().first()[0] is not None
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[tag] = best
    for p in (enc, pl):
        shutil.rmtree(p, ignore_errors=True)
    return out


def key_rotation(spark, scale):
    """rotate_encryption_key on a growing table — the claim is O(1)
    (one KEK re-wrap + one metadata commit, zero file I/O), so the
    cell must stay flat in milliseconds while the table grows 10x."""
    import base64 as _b64

    from argodb_mapreduce_spark.sources.versioned import (
        rotate_encryption_key,
        snapshot_read,
    )

    fmt = _pyds(spark)
    n = BASE_ROWS * scale
    p = f"/tmp/bench_r14_rotate_{scale}"
    shutil.rmtree(p, ignore_errors=True)
    _rows(spark, n).write.format(fmt).mode("append").option(
        "encryptionKey", KEY
    ).save(p)
    new_key = _b64.b64encode(bytes(range(64, 96))).decode()
    t0 = time.time()
    res = rotate_encryption_key(p, KEY, new_key)
    dt = time.time() - t0
    # post-rotation read sanity (untimed)
    assert (
        snapshot_read(spark, p, encryption_key=new_key)
        .agg(F.sum("v"))
        .first()[0]
        is not None
    )
    shutil.rmtree(p, ignore_errors=True)
    return {"rotate": dt, "files_rewritten": res["files_rewritten"]}


OPS = {
    "pyds_mapping_write": pyds_mapping_write,
    "keyed_read": keyed_read,
    "encrypted_erase": encrypted_erase,
    "uncdc_update_feed": uncdc_update_feed,
    "column_encrypted_read": column_encrypted_read,
    "key_rotation": key_rotation,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", default=",".join(OPS))
    args = ap.parse_args()
    spark = get_spark()
    # JVM/Arrow warmup so the first cell doesn't absorb JIT cost.
    _rows(spark, 10_000).agg(F.sum("v")).collect()
    for name in args.ops.split(","):
        for scale in (1, 10):
            cell = OPS[name](spark, scale)
            print(
                json.dumps({"op": name, "scale": scale, **cell}), flush=True
            )


if __name__ == "__main__":
    main()
