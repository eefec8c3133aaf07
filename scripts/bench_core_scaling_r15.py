#!/usr/bin/env python
"""Core-scaling ladder for the compute-bound queries (r15, VERDICT r14
item 8): the sf0.1 bench is floor-bound (8 vs 32 cores = 1.02x), so
parallel-compute claims need a corpus big enough for the work to
dominate the floors. Runs each named query on the 10x synthetic corpus
(scripts/gen_scale_corpus.py --scale 10, directory layout with 64k-row
row groups so scans split like a real lake) at the CURRENT session core
count; invoke once per core count:

    SPARK_GRAFT_CPUS=8  python scripts/bench_core_scaling_r15.py
    SPARK_GRAFT_CPUS=32 python scripts/bench_core_scaling_r15.py

Prints one JSON line per query: {"q", "cpus", "wall": min-of-2}.
Record the 8c/32c ratios in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from argodb_mapreduce_spark import registry
from argodb_mapreduce_spark.session import get_spark

CORPUS = os.environ.get("SPARK_GRAFT_X10_DIR", "/tmp/argodb_scale/x10")

#: Compute-bound headline queries: pure-Python codecs, shingle/minhash
#: hashing, vector math — the paths whose task time dwarfs scheduling.
QUERIES = [
    "dedup_minhash_verified",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_cdc_chunks",
    "multimodal_jpeg_decode",
    "multimodal_gif_decode",
    "multimodal_image_decode",
    "multimodal_audio_decode",
    "similarity_cosine_topk",
    "similarity_lsh_neardup",
    # batch 2: the text/decontam/BPE Python+codegen-heavy family
    "text_boilerplate_coverage",
    "decontam_ngram_overlap",
    "bpe_encode_documents",
    "text_bigram_lm_score",
    "dedup_fuzzy_levenshtein",
    "multimodal_keyframe_detect",
]


def main() -> int:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(f"core-scaling-r15-{cpus}", cpus=cpus)
    qs = registry.queries()
    results = {}
    for name in QUERIES:
        fn = qs[name]
        fn(spark, CORPUS).write.format("noop").mode("overwrite").save()  # warm
        runs = []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, CORPUS).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        results[name] = round(min(runs), 3)
        print(json.dumps({"q": name, "cpus": cpus, "wall": results[name]}))
        sys.stdout.flush()
    print(json.dumps({"cpus": cpus, "total": round(sum(results.values()), 3)}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
