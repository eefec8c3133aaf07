#!/usr/bin/env python
"""Paired-window core-scaling measurement (r15): for EACH query, run a
32-core session then an 8-core session back to back (warm + min-of-2
each), so the 8c/32c ratio is computed inside one ~1-minute window per
query instead of across two multi-minute sweeps — this VM class drifts
2x between windows (r14 memory note), which corrupts sweep-vs-sweep
ratios. Prints one JSON line per query with both walls and the ratio.

Usage: python scripts/bench_core_pairs_r15.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = os.environ.get("SPARK_GRAFT_X10_DIR", "/tmp/argodb_scale/x10")

DEFAULT = [
    "dedup_ngram_jaccard",
    "similarity_cosine_topk",
    "similarity_lsh_neardup",
    "multimodal_gif_decode",
    "multimodal_jpeg_decode",
    "dedup_fuzzy_levenshtein",
    "dedup_cdc_chunks",
    "text_bigram_lm_score",
]


def _measure(name: str, cpus: int) -> float:
    from argodb_mapreduce_spark import registry
    from argodb_mapreduce_spark.session import get_spark

    spark = get_spark(f"pair-{name}-{cpus}", cpus=cpus)
    fn = registry.queries()[name]
    fn(spark, CORPUS).write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, CORPUS).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    spark.stop()
    return round(min(runs), 3)


def main() -> int:
    names = sys.argv[1:] or DEFAULT
    for name in names:
        with open("/proc/loadavg") as f:
            load = f.read().split()[0]
        w32 = _measure(name, 32)
        w8 = _measure(name, 8)
        print(
            json.dumps(
                {
                    "q": name,
                    "w8": w8,
                    "w32": w32,
                    "ratio": round(w8 / w32, 2),
                    "load_at_start": load,
                }
            )
        )
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
