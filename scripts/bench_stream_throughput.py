"""Streaming throughput + state-store evidence for the stateful session
aggregator (VERDICT r8 next-step 4).

stream_stateful_custom's headline wall is bound by sequential
micro-batch state-store commits, not data volume. This harness makes
that quantitative on the 10x events corpus (1M events from
gen_scale_corpus.py): run the SAME applyInPandasWithState query over a
16-shard time-ordered source at maxFilesPerTrigger 1 / 4 / unbounded
(16, 4, 1 micro-batches) and record, per run:

  * wall seconds, input rows, end-to-end rows/s;
  * per-batch state metrics from StreamingQuery.recentProgress
    (stateOperators[0]): numRowsUpdated summed, numRowsTotal at the
    final batch, stateMemory peak;
  * distinct users in the corpus — numRowsTotal must stay <= that
    (state is O(active users), the timer-cleanup claim).

Usage:
    python scripts/gen_scale_corpus.py --scale 10 --out /tmp/argodb_scale/x10
    python scripts/bench_stream_throughput.py

Prints one JSON line per variant + a summary; recorded in SCALING.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from argodb_mapreduce_spark.session import get_spark  # noqa: E402

X10 = "/tmp/argodb_scale/x10"
N_SHARDS = 16


def run_variant(spark, tag: str, max_files, idx: int) -> dict:
    from argodb_mapreduce_spark.streaming.windows import (
        _collapse_provisional_sessions,
        _stateful_sessions_stream,
    )

    sink = f"bench_stateful_{idx}"
    # checkpoint-free memory sink; fresh sink name per variant
    df = _stateful_sessions_stream(
        spark, X10, max_files_per_trigger=max_files, n_shards=N_SHARDS
    )
    t0 = time.perf_counter()
    q = (
        df.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    progress = [json.loads(p.json) for p in q.recentProgress]
    n_batches = len([p for p in progress if p.get("numInputRows", 0) > 0])
    rows_in = sum(p.get("numInputRows", 0) for p in progress)
    st = [p["stateOperators"][0] for p in progress if p.get("stateOperators")]
    updated = sum(s.get("numRowsUpdated", 0) for s in st)
    final_total = st[-1].get("numRowsTotal", -1) if st else -1
    mem_peak = max((s.get("memoryUsedBytes", 0) for s in st), default=0)
    n_sessions = _collapse_provisional_sessions(spark.table(sink)).count()
    return {
        "variant": tag,
        "batches": n_batches,
        "wall_s": round(wall, 2),
        "rows_in": rows_in,
        "rows_per_s": int(rows_in / wall) if wall else None,
        "state_rows_updated": updated,
        "state_rows_final": final_total,
        "state_mem_peak_bytes": mem_peak,
        "sessions_out": n_sessions,
    }


def main() -> None:
    spark = get_spark("bench-stream-throughput")
    import duckdb

    n_users = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM read_parquet('{X10}/events.parquet/*')"
    ).fetchone()[0]
    print(json.dumps({"corpus": "x10", "distinct_users": n_users}), flush=True)
    out = []
    for idx, (tag, mf) in enumerate(
        [("maxFiles=1 (16 batches)", 1), ("maxFiles=4 (4 batches)", 4), ("unbounded (1 batch)", None)]
    ):
        try:
            rec = run_variant(spark, tag, mf, idx)
            rec["state_bounded_by_users"] = (
                0 <= rec["state_rows_final"] <= n_users
            )
        except Exception as e:  # noqa: BLE001 - record and continue
            rec = {"variant": tag, "err": f"{type(e).__name__}: {e}"[:300]}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({"metric": "stream_throughput", "n_variants": len(out)}))
    shutil.rmtree("/tmp/argodb_scale/_stream_ckpt", ignore_errors=True)


if __name__ == "__main__":
    main()
