"""Skew-stress bench: salted vs unsalted join/agg under a Zipf hot key.

VERDICT r8 next-step 3: the salted-join/salted-agg ops were
plan-asserted but never MEASURED under real skew. This harness runs
against the `--skew` corpora from gen_scale_corpus.py (one l_orderkey
carries ~20% of the fact rows, the rest Zipf(1.2)) and times, at 1x
and 10x:

join (shuffle forced — broadcast disabled, the 100 TB regime where
both sides exceed any broadcast threshold):
  * join_plain_noaqe  — sort-merge join, AQE skew handling OFF: the hot
    key's partition serializes ~20% of the probe side on one task.
  * join_plain_aqe    — same query, AQE skewedJoin ON: runtime split of
    the oversized partition (what we rely on in production).
  * join_salted       — operators/merge.salted_join: explicit 8-way salt.

agg (the distinct-count shape, where map-side partial aggregation does
NOT collapse the hot group — a plain sum/count would, making skew
invisible):
  * agg_distinct_naive    — groupBy(key).countDistinct(val): the hot
    key's whole distinct set lands on one reducer.
  * agg_distinct_twophase — groupBy(key, val).count -> groupBy(key):
    first shuffle keys on (key, val) so the hot group spreads.

Prints one JSON line per (op, scale) and a summary; recorded in
SCALING.md round-9 section.

Usage:
    python scripts/gen_scale_corpus.py --scale 1  --skew --out /tmp/argodb_scale/skew1
    python scripts/gen_scale_corpus.py --scale 10 --skew --out /tmp/argodb_scale/skew10
    python scripts/bench_skew.py [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from argodb_mapreduce_spark.session import get_spark  # noqa: E402

SKEW1 = "/tmp/argodb_scale/skew1"
SKEW10 = "/tmp/argodb_scale/skew10"


def _tables(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return li, o


def join_plain(spark, sf_dir):
    li, o = _tables(spark, sf_dir)
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_quantity", "o_orderpriority", "o_totalprice"
    )


def join_salted(spark, sf_dir):
    from argodb_mapreduce_spark.operators.merge import salted_join

    li, o = _tables(spark, sf_dir)
    return salted_join(li, o, "l_orderkey", "o_orderkey", n_salts=8).select(
        "l_orderkey", "l_quantity", "o_orderpriority", "o_totalprice"
    )


_HOT_CACHE: dict = {}


def _hot_keys(spark, sf_dir):
    """Detect once per corpus and persist to parquet — the ANALYZE-style
    stats reuse the production pattern assumes (detection is a per-table
    maintenance pass, not a per-query cost)."""
    import os

    from argodb_mapreduce_spark.operators.merge import detect_hot_keys

    if sf_dir not in _HOT_CACHE:
        out = os.path.join(sf_dir, "_hot_keys.parquet")
        if not os.path.exists(out):
            li, _ = _tables(spark, sf_dir)
            detect_hot_keys(li, "l_orderkey", hot_factor=4.0).write.parquet(out)
        _HOT_CACHE[sf_dir] = out
    return spark.read.parquet(_HOT_CACHE[sf_dir])


def join_salted_targeted(spark, sf_dir):
    """Round 10: salt ONLY the stored heavy hitters (the ~20% hot key
    plus the Zipf head); cold keys join single-copy."""
    from argodb_mapreduce_spark.operators.merge import targeted_salted_join

    li, o = _tables(spark, sf_dir)
    return targeted_salted_join(
        li, o, "l_orderkey", "o_orderkey", n_salts=8,
        hot_keys=_hot_keys(spark, sf_dir),
    ).select("l_quantity", "o_orderpriority", "o_totalprice")


def targeted_metrics(spark, sf_dir, n_part=32, n_salts=8):
    """Scale-invariant evidence for the targeted rewrite: reducer
    balance of each branch's exchange and the build-side replication
    factor vs blanket salting. The local wall clock cannot show a
    straggler (one in-memory hot task is fast); max/avg rows per
    reducer and replicated build rows are what hold at 100 TB."""
    li, o = _tables(spark, sf_dir)
    hot = _hot_keys(spark, sf_dir)
    tagged = li.join(
        F.broadcast(hot), li.l_orderkey == hot["__hk"], "left"
    )
    cold = tagged.filter(F.col("__hk").isNull()).select(
        F.pmod(F.hash("l_orderkey"), F.lit(n_part)).alias("p")
    )
    hot_rows = tagged.filter(F.col("__hk").isNotNull()).select(
        F.pmod(
            F.hash(
                "l_orderkey",
                F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)),
            ),
            F.lit(n_part),
        ).alias("p")
    )
    def _bal(df):
        r = df.groupBy("p").count().agg(
            F.max("count").alias("mx"), F.avg("count").alias("avg")
        ).collect()[0]
        return round(r.mx / r.avg, 2)
    n_hot = hot.count()
    n_build = o.count()
    return {
        "cold_branch_max_over_avg": _bal(cold),
        "hot_branch_max_over_avg": _bal(hot_rows),
        "n_hot_keys": n_hot,
        "build_rows_replicated_targeted": n_hot * n_salts,
        "build_rows_replicated_blanket": n_build * n_salts,
    }


def agg_distinct_naive(spark, sf_dir):
    li, _ = _tables(spark, sf_dir)
    return li.groupBy("l_orderkey").agg(
        F.count_distinct("l_partkey").alias("n_parts")
    )


def agg_distinct_twophase(spark, sf_dir):
    li, _ = _tables(spark, sf_dir)
    return (
        li.select("l_orderkey", "l_partkey")
        .distinct()  # shuffle keyed on (key, val): hot group spreads
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


def time_op(spark, fn, sf_dir, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def balance(spark, sf_dir, n_part=32, salted=False):
    """EXACT reduce-partition row balance of the fact-side shuffle:
    SQL exchanges use HashPartitioning = pmod(murmur3(keys), n), which
    is precisely F.hash/F.pmod — so this measures, not simulates, the
    rows each reducer would receive. max/avg is the straggler factor:
    scale-invariant, it holds at 100 TB where the local wall clock
    (one in-memory hot task) cannot show it."""
    li, _ = _tables(spark, sf_dir)
    if salted:
        key = li.withColumn(
            "salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(8))
        ).select(F.pmod(F.hash("l_orderkey", "salt"), F.lit(n_part)).alias("p"))
    else:
        key = li.select(F.pmod(F.hash("l_orderkey"), F.lit(n_part)).alias("p"))
    rows = key.groupBy("p").count().agg(
        F.max("count").alias("mx"), F.avg("count").alias("avg")
    ).collect()[0]
    return round(rows.mx / rows.avg, 2)


def aqe_skew_split_fired(spark, sf_dir) -> bool:
    """Execute the plain join under AQE skew handling (thresholds tuned
    to the corpus' MB scale — at 100 TB the 256 MB defaults fire by
    themselves) and check the FINAL adaptive plan for the skew=true
    sort-merge-join marker. Driving the DataFrame's own queryExecution
    (toRdd) is what finalizes ITS adaptive plan — a write action plans
    a separate QueryExecution whose final plan we could not read."""
    df = join_plain(spark, sf_dir)
    df._jdf.queryExecution().toRdd().count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "skew=true" in plan


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    a = ap.parse_args()
    spark = get_spark("bench-skew")
    # 100 TB regime: no broadcast joins — both sides exceed any threshold.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # Scale AQE's skew thresholds to the corpus (defaults are 256 MB and
    # 5x-median — sized for real clusters; the hot partition here is
    # ~25 MB compressed over 32 reducers).
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")

    def with_aqe_skew(enabled: bool):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(enabled).lower())

    for sf_dir, tag in ((SKEW1, "x1"), (SKEW10, "x10")):
        print(
            json.dumps(
                {
                    "op": f"shuffle_balance_{tag}",
                    "unsalted_max_over_avg": balance(spark, sf_dir),
                    "salted_max_over_avg": balance(spark, sf_dir, salted=True),
                }
            ),
            flush=True,
        )
    with_aqe_skew(True)
    print(
        json.dumps({"op": "aqe_skew_split_fired_x10", "fired": aqe_skew_split_fired(spark, SKEW10)}),
        flush=True,
    )
    for sf_dir, tag in ((SKEW1, "x1"), (SKEW10, "x10")):
        print(
            json.dumps({"op": f"targeted_metrics_{tag}", **targeted_metrics(spark, sf_dir)}),
            flush=True,
        )

    plans = [
        ("join_plain_noaqe", join_plain, False),
        ("join_plain_aqe", join_plain, True),
        ("join_salted", join_salted, True),
        ("join_salted_targeted_noaqe", join_salted_targeted, False),
        ("join_salted_targeted", join_salted_targeted, True),
        ("agg_distinct_naive", agg_distinct_naive, True),
        ("agg_distinct_twophase", agg_distinct_twophase, True),
    ]
    out = {}
    for name, fn, aqe_skew in plans:
        with_aqe_skew(aqe_skew)
        try:
            t1 = time_op(spark, fn, SKEW1, a.reps)
            t10 = time_op(spark, fn, SKEW10, a.reps)
            rec = {"op": name, "t1": round(t1, 3), "t10": round(t10, 3),
                   "ratio": round(t10 / t1, 2)}
        except Exception as e:  # noqa: BLE001 - record and continue
            rec = {"op": name, "err": f"{type(e).__name__}: {e}"[:300]}
        out[name] = rec
        print(json.dumps(rec), flush=True)
    print(json.dumps({"metric": "skew_bench", "n_ops": len(out)}))


if __name__ == "__main__":
    main()
