#!/usr/bin/env python
"""Where does the ~1.5-2 s pyds streaming floor go? (r15 item 4)

Runs one pyds availableNow drain (the stream_versioned_ingest shape)
N times with per-phase wall segments and the engine's own per-batch
durationMs breakdown (StreamingQueryProgress), so the floor decomposes
into: plan construction, .start() (planner-worker spawn), per-batch
trigger work (latestOffset / planInputPartitions / addBatch / WAL
commits), and teardown.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F

from argodb_mapreduce_spark.session import get_spark
from argodb_mapreduce_spark.sources.python_datasource import (
    FORMAT_NAME,
    _stream_fixture,
    register_datasource,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("profile-r15-stream")
    register_datasource(spark)
    out = _stream_fixture(spark, SF_DIR)

    for trial in range(4):
        scratch = tempfile.mkdtemp(prefix="r15prof_")
        ck = os.path.join(scratch, "ck")
        t0 = time.perf_counter()
        s = spark.readStream.format(FORMAT_NAME).load(out)
        agg = s.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("sum_key"),
        )
        t1 = time.perf_counter()
        q = (
            agg.writeStream.format("memory")
            .queryName(f"prof_sink_{trial}")
            .outputMode("complete")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        t2 = time.perf_counter()
        q.awaitTermination()
        t3 = time.perf_counter()
        prog = [json.loads(p.json) for p in q.recentProgress]
        t4 = time.perf_counter()
        print(
            f"trial={trial} construct={t1-t0:.3f} start={t2-t1:.3f} "
            f"await={t3-t2:.3f} harvest={t4-t3:.3f} total={t3-t0:.3f}"
        )
        for p in prog:
            print(
                "  batch", p.get("batchId"),
                "durationMs", json.dumps(p.get("durationMs")),
                "rows", p.get("numInputRows"),
            )
        shutil.rmtree(scratch, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
