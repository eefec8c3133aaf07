"""Watermark late-data semantics with a real two-batch streaming run.

Batch 1 establishes the watermark (max ts - 10 min); batch 2 arrives
with one on-time and one too-late event. In append mode the too-late
event's window is already finalized, so it must not change the emitted
result — the late row is dropped by the watermark.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("k", T.StringType()),
    ]
)


@pytest.mark.parametrize("mode", ["append"])
def test_watermark_drops_late_rows(spark, tmp_path, mode):
    src = tmp_path / "src"
    os.makedirs(src, exist_ok=True)

    def write_batch(name, rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "stage" / name)
        )
        import shutil

        for f in os.listdir(tmp_path / "stage" / name):
            if f.endswith(".parquet"):
                shutil.copy(tmp_path / "stage" / name / f, src / f"{name}.parquet")

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(str(src))
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes"), "k")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window.start").alias("ws"), "k", "n")
        )
        out_dir = str(tmp_path / "out")
        q = (
            agg.writeStream.format("parquet")
            .outputMode(mode)
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {(r.ws, r.k): r.n for r in spark.read.parquet(out_dir).collect()}

    # Run 1: events up to t0+60min → watermark (persisted in the
    # checkpoint) advances to t0+50min. Append-mode emission lags one
    # batch, so the finalized windows surface on the next run.
    write_batch(
        "b1",
        [(t0 + dt.timedelta(minutes=m), "a") for m in (1, 2, 31, 60)],
    )
    out1 = run()

    # Run 2: one event inside the long-finalized first window (late by
    # ~48 min > the 10-min watermark delay) and one recent event. The
    # late row must be dropped before aggregation.
    write_batch(
        "b2",
        [(t0 + dt.timedelta(minutes=2, seconds=30), "a"), (t0 + dt.timedelta(minutes=62), "a")],
    )
    out2 = run()
    emitted = {**out1, **out2}
    # The [00:00,00:05) window holds the 2 on-time events — NOT 3: the
    # late arrival was discarded by the watermark.
    assert emitted.get((t0, "a")) == 2, f"late row leaked into finalized window: {emitted}"


def test_session_window_state_merges_bridging_event(spark, tmp_path):
    """The defining behavior of session-window state: two sessions 20
    minutes apart (gap 15 min → separate) MERGE into one when a later
    micro-batch delivers a bridging event between them. availableNow +
    maxFilesPerTrigger=1 splits the two files into two micro-batches of
    one run; foreachBatch snapshots the complete-mode state after each."""
    import datetime as dt
    import shutil
    import time as _time

    src = tmp_path / "msrc"
    os.makedirs(src, exist_ok=True)
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def write_file(name, rows):
        stage = tmp_path / "mstage" / name
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(str(stage))
        for f in os.listdir(stage):
            if f.endswith(".parquet"):
                shutil.copy(stage / f, src / f"{name}.parquet")

    # File 1: two events 20 min apart -> two sessions at a 15-min gap.
    write_file("b1", [(t0, "u"), (t0 + dt.timedelta(minutes=20), "u")])
    _time.sleep(1.1)  # distinct mtime so the file source orders b1 before b2
    # File 2: a bridging event 10 min in -> within gap of both sessions.
    write_file("b2", [(t0 + dt.timedelta(minutes=10), "u")])

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "15 minutes"), "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("session_window.start").alias("ss"),
            F.col("session_window.end").alias("se"),
            "n",
        )
    )
    snapshots = []

    def capture(batch_df, batch_id):
        snapshots.append(sorted((r.ss, r.se, r.n) for r in batch_df.collect()))

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(capture)
        .option("checkpointLocation", str(tmp_path / "mckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert len(snapshots) >= 2, snapshots
    # After batch 1: two separate sessions of one event each.
    assert snapshots[0] == [
        (t0, t0 + dt.timedelta(minutes=15), 1),
        (t0 + dt.timedelta(minutes=20), t0 + dt.timedelta(minutes=35), 1),
    ], snapshots[0]
    # After the bridging batch: ONE merged session spanning all three.
    assert snapshots[-1] == [
        (t0, t0 + dt.timedelta(minutes=35), 3),
    ], snapshots[-1]
