"""Round-14 optimization profiler: wall time + Spark job count per query.

Usage: python scripts/profile_r14.py name1 name2 ... [--sf DIR] [--runs N]
       python scripts/profile_r14.py --all            # every headline query, 1 run

For each named registry query: clearCache, set a job group, materialize
through the noop sink, then report wall seconds and the number of Spark
jobs the query launched (statusTracker on the job group). In local mode
each job carries ~50-300 ms of fixed scheduling/planning cost, so for
the fixture-heavy lakehouse queries the job COUNT is the first-order
cost model (guide §1.1 first-principles view: how many passes are
fundamentally required vs. launched).

Prints one JSON line per query: {"q": name, "wall": s, "jobs": n}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from argodb_mapreduce_spark import registry  # noqa: E402
from argodb_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    runs = 1
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    if "--all" in args:
        import bench

        names = list(bench.HEADLINE)
    else:
        names = args
    spark = get_spark("profile-r14")
    qs = registry.queries()
    sc = spark.sparkContext
    out = []
    for name in names:
        best = None
        for r in range(runs):
            spark.catalog.clearCache()
            group = f"prof:{name}:{r}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            if best is None or wall < best[0]:
                best = (wall, jobs)
        rec = {"q": name, "wall": round(best[0], 3), "jobs": best[1]}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    print(
        json.dumps(
            {
                "total_wall": round(sum(r["wall"] for r in out), 3),
                "total_jobs": sum(r["jobs"] for r in out),
                "n": len(out),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
