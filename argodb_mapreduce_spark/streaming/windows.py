"""Streaming windows over the events table (SURVEY.md §2.C6).

Tumbling / sliding / session windows in batch mode (full DuckDB
oracles), plus the same tumbling aggregation executed as an actual
Structured Streaming query (file source → availableNow trigger →
memory sink) — the streaming result is oracle-checked against the same
SQL because a complete-mode availableNow run over a static source is
semantically the batch query.

Late-data handling: the streaming variants carry a watermark; with
availableNow + complete output the watermark does not drop rows, so
results stay deterministic (SURVEY.md §7 risk 4 mitigation — every
streaming query mirrors a batch twin with identical window exprs).

The events fixture has stored ts as parquet TIMESTAMP(NANOS) in some
rounds and TIMESTAMP(MICROS)/ntz in others; the streaming source
footer-sniffs the unit (`_events_ts_unit`) and bridges either flavor to
a plain ltz TIMESTAMP — same normalization as catalog.read_parquet_any
— so window boundaries match DuckDB in both cases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from argodb_mapreduce_spark.catalog import load_table, table_path, table_rowcount
from argodb_mapreduce_spark.functions.oracle_safe import dsum
from argodb_mapreduce_spark.registry import register

_US_30M = 30 * 60 * 1_000_000
_US_1H = 60 * 60 * 1_000_000


@register(
    "stream_window_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("streaming", "window"),
    doc="Tumbling 1-hour event-time windows (batch mode — same expression Structured Streaming uses).",
)
def stream_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", 2).alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "stream_window_sliding",
    oracle=f"""
    SELECT make_timestamp((epoch_us(ts) // {_US_30M}) * {_US_30M} - k * {_US_30M}) AS window_start,
           make_timestamp((epoch_us(ts) // {_US_30M}) * {_US_30M} - k * {_US_30M} + {_US_1H}) AS window_end,
           COUNT(*) AS n_events
    FROM events, UNNEST([CAST(0 AS BIGINT), CAST(1 AS BIGINT)]) AS u(k)
    GROUP BY 1, 2
    """,
    tags=("streaming", "window"),
    doc=(
        "Sliding windows (1 hour, 30-minute slide): every event lands in "
        "exactly two epoch-aligned windows; the oracle materializes both "
        "via an explicit 2-row unnest."
    ),
)
def stream_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
        )
    )


@register(
    "stream_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL 15 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    sessions AS (
      -- event_id tie-break matches the flagged CTE's ordering: duplicate
      -- (user_id, ts) rows must not split a tie group nondeterministically
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 15 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_no
    """,
    tags=("streaming", "window", "session"),
    doc=(
        "Session windows (15-minute gap) per user: Spark session_window "
        "vs the classic gaps-and-islands SQL formulation — a new session "
        "starts when the gap reaches the timeout; session end = last "
        "event + gap, matching Spark's [start, last+gap) semantics."
    ),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "15 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def _events_raw_schema(ts_unit: str) -> T.StructType:
    """Declared file-source schema for the events stream.

    TIMESTAMP(NANOS) fixtures must be declared LONG (Spark's vectorized
    reader rejects ns timestamps; nanosAsLong reads the raw int64);
    TIMESTAMP(MICROS) fixtures without isAdjustedToUTC are ntz.
    """
    ts_type = T.LongType() if ts_unit == "ns" else T.TimestampNTZType()
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def _events_ts_unit(sf_dir: str) -> str:
    """Footer-sniff the events fixture's ts storage unit ('ns' | 'us').
    Handles both a single ``events.parquet`` file and a directory of
    part files (multi-split lake layout — first footer speaks for all,
    same convention as catalog._ns_timestamp_columns)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = table_path(sf_dir, "events")
    if os.path.isdir(path):
        parts = sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
        )
        if not parts:
            raise ValueError(f"no parquet parts under {path}")
        path = parts[0]
    t = pq.ParquetFile(path).schema_arrow.field("ts").type
    return "ns" if (pa.types.is_timestamp(t) and t.unit == "ns") else "us"


def _bridge_ts(raw: DataFrame, ts_unit: str) -> DataFrame:
    """Normalize the declared-schema ts to ltz TIMESTAMP (same contract
    as catalog.read_parquet_any): ns fixtures truncate epoch-nanos to µs,
    µs/ntz fixtures cast wall-clock-preserving."""
    if ts_unit == "ns":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def _stale(src: str, marker: str) -> bool:
    """True when the staged copy predates the source fixture (the driver
    regenerates testdata between rounds; /tmp may survive)."""
    from argodb_mapreduce_spark.catalog import fixture_stale

    return fixture_stale(src, marker)


def _stream_dir(sf_dir: str) -> str:
    """The streaming file source requires a directory; stage the single
    events parquet file into a per-sf scratch dir (testdata is read-only)."""
    import os
    import shutil
    import tempfile

    tag = sf_dir.strip("/").replace("/", "_")
    d = os.path.join(tempfile.gettempdir(), "argodb_mapreduce_spark", tag, "events_stream")
    src = table_path(sf_dir, "events")
    marker = os.path.join(d, "events.parquet")
    if _stale(src, marker):
        os.makedirs(d, exist_ok=True)
        shutil.copy(src, marker)
    return d


def _read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    unit = _events_ts_unit(sf_dir)
    if unit == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.readStream.schema(_events_raw_schema(unit)).parquet(_stream_dir(sf_dir))
    return _bridge_ts(raw, unit)


#: Target input rows per stateful-stream shuffle/state partition. A
#: stateful streaming query pins its STATE partition count to
#: ``spark.sql.shuffle.partitions`` at first checkpoint, and every
#: micro-batch then commits one state-store delta PER PARTITION — so a
#: bounded availableNow drain with far fewer rows than
#: partitions × target pays state-store fixed costs for empty
#: partitions every batch (A/B at sf0.1, 100k events: tumbling 1.54→1.20,
#: dedup 1.86→1.21, sliding 1.46→0.75, stream-stream join 8.26→2.37 —
#: the join keeps FOUR state stores per partition, so it gains most).
#: The derivation is input-size-based (guide §2.2: size partitions to
#: data, never to the machine) and CLAMPED to the session default, so
#: a cluster-scale input keeps the session's full parallelism. Python-
#: stateful streams (applyInPandasWithState) deliberately do NOT use it:
#: their per-partition cost is a Python worker, and the same A/B showed
#: them 1.4× SLOWER at reduced width — see stream_stateful_counts.
_STREAM_ROWS_PER_PARTITION = 25_000


def run_stream_resilient(start):
    """Start a streaming query via ``start()`` (must build a FRESH
    writer and ``.start()`` it) and await termination, retrying ONCE
    when the start dies on Spark's hard-coded 10 s Python-worker
    connect-back window ("Timed out while waiting for the Python worker
    to connect back", PythonWorkerFactory.createSimpleWorker). That
    path spawns the non-daemon Python PLANNER worker a Python-
    DataSource stream needs before its first batch — under full
    machine load a fresh interpreter can miss the window, killing the
    query while it is still INITIALIZING with nothing committed
    (observed once in ~40 full bench runs). Task-side workers fork
    from the daemon and never hit this message, so the guard retries
    exactly the pre-commit spawn flake; every sink this repo drives is
    checkpoint- or txn-stamped, so even a later replay is exactly-once.
    Any other streaming failure re-raises unchanged."""
    try:
        q = start()
        q.awaitTermination()
        return q
    except Exception as e:  # noqa: BLE001 - retry ONLY the spawn flake
        if "connect back" not in str(e):
            raise
        q = start()
        q.awaitTermination()
        return q


def _run_to_memory(df, name: str, output_mode: str, input_rows: int | None = None):
    """Run to completion under availableNow; returns the finished query
    so callers can harvest recentProgress (state-store metrics).

    ``input_rows`` — when the caller knows the bounded source's size
    (parquet footer metadata, free), the stream's shuffle/state
    partition count is derived from it for the duration of the run
    (state partitioning is fixed at checkpoint creation, so this must
    happen before ``start()``); the session value is restored after."""
    spark = df.sparkSession
    prev = None
    if input_rows is not None:
        try:
            prev = spark.conf.get("spark.sql.shuffle.partitions")
            scaled = max(2, min(int(prev), -(-input_rows // _STREAM_ROWS_PER_PARTITION)))
            spark.conf.set("spark.sql.shuffle.partitions", str(scaled))
        except Exception:  # noqa: BLE001 - keep session width
            prev = None
    try:
        q = run_stream_resilient(
            lambda: df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return q


@register(
    "stream_tumbling_live",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "live"),
    doc=(
        "REAL Structured Streaming run: file source → watermark → "
        "tumbling-window agg → availableNow trigger → memory sink, "
        "returned as a DataFrame. Complete output over a static source "
        "is semantically the batch query, so even the live streaming "
        "path is DuckDB-oracle-checked."
    ),
)
def stream_tumbling_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read_event_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", 2).alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    _run_to_memory(agg, "stream_tumbling_live_sink", "complete",
                   input_rows=table_rowcount(sf_dir, "events"))
    return spark.table("stream_tumbling_live_sink")


@register(
    "stream_dedup_watermark",
    oracle="SELECT DISTINCT event_id, user_id FROM events",
    tags=("streaming", "live", "dedup"),
    doc=(
        "Streaming dedup: dropDuplicatesWithinWatermark on event_id over "
        "the live stream (event_ids are unique, so the deterministic "
        "result equals DISTINCT — the op's plumbing is what's exercised)."
    ),
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read_event_stream(spark, sf_dir)
    dedup = (
        events.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id")
    )
    _run_to_memory(dedup, "stream_dedup_sink", "append",
                   input_rows=table_rowcount(sf_dir, "events"))
    return spark.table("stream_dedup_sink")


@register(
    "stream_stateful_counts",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events
    FROM events GROUP BY user_id
    """,
    tags=("streaming", "live", "stateful"),
    doc=(
        "Custom stateful streaming operator: per-user running event counts "
        "via applyInPandasWithState (arbitrary state, update mode). Over a "
        "single availableNow batch the final state equals the batch "
        "GROUP BY, so even arbitrary-stateful streaming is oracle-checked."
    ),
)
def stream_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The counter reads nothing but the grouping key — project to it
    # before the stateful op (guide §4; Catalyst cannot prune through
    # applyInPandasWithState), so only one long column is shuffled and
    # Arrow-shipped instead of all six event columns.
    events = _read_event_stream(spark, sf_dir).select("user_id")

    def update_counts(key, pdfs, state):
        import pandas as pd

        current = state.get[0] if state.exists else 0
        for pdf in pdfs:
            current += len(pdf)
        state.update((current,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [current]})

    counts = events.groupBy("user_id").applyInPandasWithState(
        update_counts,
        outputStructType="user_id long, n_events long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf="NoTimeout",
    )
    # NO input_rows here: applyInPandasWithState runs PYTHON per state
    # partition, so shrinking the state width also shrinks Python-worker
    # parallelism — A/B measured 1.6 s → 2.3 s at 4 partitions. The
    # row-count derivation is for JVM-side window/join state, where the
    # per-partition cost is a state-store commit, not a Python worker.
    _run_to_memory(counts, "stream_stateful_sink", "update")
    return spark.table("stream_stateful_sink")


@register(
    "stream_join_live",
    oracle="""
    SELECT v.user_id,
           v.event_id AS view_id,
           p.event_id AS purchase_id
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
    WHERE v.event_type = 'view' AND p.event_type = 'purchase'
    """,
    tags=("streaming", "live", "join"),
    doc=(
        "REAL stream-stream inner join: views joined to purchases by the "
        "same user within 30 minutes, watermarks on both sides bounding "
        "the state store (Spark evicts buffered rows older than watermark "
        "+ join window — the property that keeps state finite on an "
        "unbounded stream). availableNow over the static source makes the "
        "result equal the batch interval join, so it is oracle-checked."
    ),
)
def stream_join_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read_event_stream(spark, sf_dir)
    views = (
        events.filter(F.col("event_type") == "view")
        .withWatermark("ts", "1 hour")
        .select(F.col("user_id").alias("v_user"), F.col("event_id").alias("view_id"), F.col("ts").alias("v_ts"))
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
        .select(F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts"))
    )
    joined = views.join(
        purchases,
        F.expr(
            "v_user = p_user AND p_ts >= v_ts AND p_ts <= v_ts + INTERVAL 30 MINUTES"
        ),
    ).select(F.col("v_user").alias("user_id"), "view_id", "purchase_id")
    _run_to_memory(joined, "stream_join_sink", "append",
                   input_rows=table_rowcount(sf_dir, "events"))
    return spark.table("stream_join_sink")


def _sharded_stream_dir(sf_dir: str, n_shards: int = 3) -> str:
    """Stage events split into n_shards parquet files so availableNow +
    maxFilesPerTrigger=1 yields a real multi-batch stream. Splitting
    keeps the original arrow schema (TIMESTAMP(NANOS) preserved) —
    fixture staging only, not a data path."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    tag = sf_dir.strip("/").replace("/", "_")
    d = os.path.join(
        tempfile.gettempdir(), "argodb_mapreduce_spark", tag, f"events_stream_{n_shards}shard"
    )
    done = os.path.join(d, "_STAGED")
    src = table_path(sf_dir, "events")
    if _stale(src, done):
        os.makedirs(d, exist_ok=True)
        t = pq.read_table(src)
        ids = t.column("event_id").to_numpy()
        for i in range(n_shards):
            pq.write_table(t.filter(pa.array(ids % n_shards == i)), os.path.join(d, f"shard_{i}.parquet"))
        with open(done, "w") as f:
            f.write("ok")
    return d


@register(
    "stream_merge_upsert_live",
    oracle="""
    SELECT user_id, ts AS last_ts, event_id AS last_event_id, value AS last_value
    FROM (
      SELECT user_id, ts, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("streaming", "live", "merge"),
    doc=(
        "Streaming CDC-apply: foreachBatch MERGE of each micro-batch "
        "into a keyed state table (latest event per user, ties on "
        "event_id), run as a REAL 3-batch availableNow stream "
        "(maxFilesPerTrigger=1 over a sharded source). Latest-wins is "
        "commutative/associative, so the final state is deterministic "
        "under any batch split — which is why it can be oracle-checked "
        "against the batch window query. Each merge touches only "
        "O(state ∪ batch) rows; at scale the state table is a Delta/"
        "Iceberg MERGE target keyed and partitioned by user_id."
    ),
)
def stream_merge_upsert_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from pyspark.sql import Window

    unit = _events_ts_unit(sf_dir)
    if unit == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(_events_raw_schema(unit))
        .option("maxFilesPerTrigger", 1)
        .parquet(_sharded_stream_dir(sf_dir))
    )
    events = _bridge_ts(raw, unit)

    state_root = tempfile.mkdtemp(prefix="stream_merge_state_")
    ckpt = tempfile.mkdtemp(prefix="stream_merge_ckpt_")
    w = Window.partitionBy("user_id").orderBy(F.col("last_ts").desc(), F.col("last_event_id").desc())

    def latest_per_user(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_latest = latest_per_user(
            batch_df.select(
                "user_id",
                F.col("ts").alias("last_ts"),
                F.col("event_id").alias("last_event_id"),
                F.col("value").alias("last_value"),
            )
        )
        versions = sorted(v for v in os.listdir(state_root) if v.startswith("v"))
        if versions:
            prev = batch_df.sparkSession.read.parquet(os.path.join(state_root, versions[-1]))
            merged = latest_per_user(prev.unionByName(batch_latest))
        else:
            merged = batch_latest
        merged.write.parquet(os.path.join(state_root, f"v{batch_id:05d}"))

    run_stream_resilient(
        lambda: events.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    final = sorted(v for v in os.listdir(state_root) if v.startswith("v"))[-1]
    return spark.read.parquet(os.path.join(state_root, final))


# transformWithStateInPandas (Spark 4's successor to
# applyInPandasWithState) was attempted here but its state protocol
# requires `google.protobuf`, which this container does not ship
# (ImportError inside pyspark's transform_with_state_driver_worker;
# re-probed 2026-08-16 with the RocksDB state store provider — a
# ValueState RunningCount processor reaches the driver worker and dies
# on the same missing protobuf import, so the block is env-level, not
# API-level).
# The capability it demonstrates — arbitrary keyed state over a real
# multi-batch stream — is covered by stream_stateful_counts
# (applyInPandasWithState) and stream_merge_upsert_live (foreachBatch);
# on a normal Spark 4 deployment the RunningMax processor translates
# mechanically (ValueState + handleInputRows).


@register(
    "stream_sliding_live",
    oracle=f"""
    SELECT make_timestamp((epoch_us(ts) // {_US_30M}) * {_US_30M} - k * {_US_30M}) AS window_start,
           make_timestamp((epoch_us(ts) // {_US_30M}) * {_US_30M} - k * {_US_30M} + {_US_1H}) AS window_end,
           COUNT(*) AS n_events
    FROM events, UNNEST([CAST(0 AS BIGINT), CAST(1 AS BIGINT)]) AS u(k)
    GROUP BY 1, 2
    """,
    tags=("streaming", "live"),
    doc=(
        "REAL Structured Streaming run of the SLIDING window (1 hour, "
        "30-minute slide): file source -> watermark -> sliding-window agg "
        "-> availableNow trigger -> memory sink. Complete output over a "
        "static source equals the batch sliding query, so the live "
        "overlapping-window path is oracle-checked like the tumbling one."
    ),
)
def stream_sliding_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read_event_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
        )
    )
    _run_to_memory(agg, "stream_sliding_live_sink", "complete",
                   input_rows=table_rowcount(sf_dir, "events"))
    return spark.table("stream_sliding_live_sink")


@register(
    "stream_session_live",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL 15 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 15 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_no
    """,
    tags=("streaming", "live", "session"),
    doc=(
        "REAL Structured Streaming session windows: file source → "
        "watermark → session_window(15 min gap) state merge → "
        "availableNow → memory sink. Session-window state merges "
        "adjacent sessions as late rows arrive (the one windowed agg "
        "whose state is variable-width); complete output over a static "
        "source equals the batch gaps-and-islands SQL, so the live "
        "path is oracle-checked like the tumbling/sliding runs. "
        "Watermark bounds state: closed sessions (older than gap + "
        "watermark) are emitted and dropped — the property that keeps "
        "state finite on an unbounded stream."
    ),
)
def stream_session_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read_event_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "15 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
    _run_to_memory(agg, "stream_session_live_sink", "complete",
                   input_rows=table_rowcount(sf_dir, "events"))
    return spark.table("stream_session_live_sink")


@register(
    "stream_quality_gate_live",
    oracle="""
    WITH s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS checked_rows,
             CAST(COUNT(*) - COUNT(value) AS BIGINT) AS v_null,
             CAST(SUM(CASE WHEN value < 0 OR value > 450 THEN 1 ELSE 0 END) AS BIGINT) AS v_range,
             CAST(SUM(CASE WHEN event_type NOT IN ('view','click','purchase','signup','error')
                           THEN 1 ELSE 0 END) AS BIGINT) AS v_domain
      FROM events
    )
    SELECT 'events.value:not_null' AS constraint_name, checked_rows,
           v_null AS violations, v_null = 0 AS passed FROM s
    UNION ALL
    SELECT 'events.value:range[0,450]', checked_rows, v_range, v_range = 0 FROM s
    UNION ALL
    SELECT 'events.event_type:accepted', checked_rows, v_domain, v_domain = 0 FROM s
    """,
    tags=("streaming", "live", "quality"),
    doc=(
        "Streaming quality gate — the ingest-time twin of "
        "dq_constraint_audit: per-row constraint counters (null, range, "
        "accepted-values) maintained as a REAL multi-batch Structured "
        "Streaming aggregation (sharded source, 2 files per trigger, "
        "availableNow, complete mode). Row-local counters are "
        "associative sums, so the final report is independent of the "
        "batch split — which is exactly why the live run can be "
        "oracle-checked against the batch query."
    ),
)
def stream_quality_gate_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch-updated constraint counters over the event stream.

    Scale design: the counters are a map-combinable global aggregate —
    state is O(constraints), not O(rows), so the gate adds no shuffle
    pressure to an ingest pipeline; at 100 TB/day the same plan runs
    continuously and the report stays 3 rows. A range/domain violation
    in a micro-batch surfaces in the next trigger's complete output —
    the alerting hook a curation pipeline wants BEFORE bad data lands.
    """
    unit = _events_ts_unit(sf_dir)
    if unit == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # 2 files per trigger (r15, same lever as stream_stateful_custom):
    # the 3 shards drain in TWO micro-batches instead of three — one
    # fewer trigger round + state-commit cycle while the run stays
    # genuinely multi-batch. The counters are associative sums, so the
    # final report is batch-split-independent by construction (the
    # docstring's own oracle-checkability argument).
    raw = (
        spark.readStream.schema(_events_raw_schema(unit))
        .option("maxFilesPerTrigger", 2)
        .parquet(_sharded_stream_dir(sf_dir))
    )
    events = _bridge_ts(raw, unit)
    one = F.lit(1).cast("bigint")
    zero = F.lit(0).cast("bigint")
    counters = events.agg(
        F.count(F.lit(1)).alias("checked_rows"),
        (F.count(F.lit(1)) - F.count("value")).alias("v_null"),
        F.sum(
            F.when((F.col("value") < 0) | (F.col("value") > 450), one).otherwise(zero)
        ).alias("v_range"),
        F.sum(
            F.when(
                ~F.col("event_type").isin("view", "click", "purchase", "signup", "error"),
                one,
            ).otherwise(zero)
        ).alias("v_domain"),
    )
    _run_to_memory(counters, "stream_quality_gate_sink", "complete",
                   input_rows=table_rowcount(sf_dir, "events"))
    s = spark.table("stream_quality_gate_sink")
    return s.select(
        F.expr(
            "stack(3, 'events.value:not_null', v_null,"
            " 'events.value:range[0,450]', v_range,"
            " 'events.event_type:accepted', v_domain)"
        ).alias("constraint_name", "violations"),
        "checked_rows",
    ).select(
        "constraint_name",
        "checked_rows",
        "violations",
        (F.col("violations") == 0).alias("passed"),
    )


def _time_sharded_stream_dir(sf_dir: str, n_shards: int = 4) -> str:
    """Stage events as n_shards CONTIGUOUS-TIME parquet slices with
    ascending mtimes, so availableNow + maxFilesPerTrigger=1 replays the
    stream in event-time order (the arrival order a real ingest has).
    Time-ordered batches are what make an event-time-timer session
    aggregator oracle-checkable: once the watermark passes a session's
    end + gap, no later batch can contain an event that extends it, so
    timer-closed sessions are final. Fixture staging only."""
    import os
    import tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tag = sf_dir.strip("/").replace("/", "_")
    d = os.path.join(
        tempfile.gettempdir(),
        "argodb_mapreduce_spark",
        tag,
        f"events_stream_time{n_shards}",
    )
    done = os.path.join(d, "_STAGED")
    src = table_path(sf_dir, "events")
    if _stale(src, done):
        os.makedirs(d, exist_ok=True)
        t = pq.read_table(src)
        t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]))
        per = (t.num_rows + n_shards - 1) // n_shards
        now = int(__import__("time").time())
        for i in range(n_shards):
            chunk = t.slice(i * per, per)
            p = os.path.join(d, f"shard_{i}.parquet")
            pq.write_table(chunk, p)
            os.utime(p, (now + i, now + i))  # FileStreamSource orders by mtime
        with open(done, "w") as f:
            f.write("ok")
    return d


@register(
    "stream_stateful_custom",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > {30 * 60 * 1_000_000}
                     THEN 1 ELSE 0 END AS new_sess
      FROM ordered
    ), numbered AS (
      SELECT *, SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM flagged
    )
    SELECT user_id,
           CAST(session_seq AS BIGINT) AS session_seq,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM numbered
    GROUP BY user_id, session_seq
    """,
    tags=("streaming", "live", "stateful", "timers"),
    doc=(
        "Arbitrary stateful session aggregator WITH EVENT-TIME TIMERS: "
        "applyInPandasWithState(EventTimeTimeout) over a real multi-batch "
        "(4 time shards, 2 per trigger) availableNow stream. State per "
        "user = the open "
        "session (start/end/count as longs); a timer at end+gap fires "
        "once the watermark passes it, emits the closed session, and "
        "CLEARS the key's state — the state-bounding behavior a "
        "hand-written MapReduce reducer with state needs at 100 TB. "
        "Oracle = batch gap-sessionization (events_sessionize shape)."
    ),
)
def stream_stateful_custom(spark: SparkSession, sf_dir: str, _timer_marker_dir: str | None = None) -> DataFrame:
    """Session building is deterministic vs the batch oracle because the
    staged stream replays in event-time order: provisional (open) session
    rows emitted in update mode are superseded by later rows with the
    same (user_id, session_start) and a larger end/count, so the final
    ``MAX`` collapse yields exactly the batch sessions; timer-closed
    sessions can never be extended (watermark > end+gap bounds any
    future event's ts strictly above end+gap).

    State-schema-evolution note: applyInPandasWithState pins
    ``stateStructType`` at query start — adding a field needs a new
    checkpoint (a stop-the-world migration). Spark 4's
    transformWithStateInPandas supports in-place state schema evolution
    (add/remove value-state fields between restarts) and is the
    mechanical translation of this processor (ValueState + timers in
    ``handleInputRows``/``handleExpiredTimer``); it is env-blocked here
    because its state protocol imports google.protobuf, which this
    container does not ship (re-probed 2026-08-15, still absent).

    100x scale: state is O(active users), keys partition across
    executors, timers bound state lifetime to one gap past the
    watermark; the memory-sink collapse below is a driver-side test
    convenience — production writes the update stream to a keyed sink.
    """
    # 2 files per trigger (r15, VERDICT r14 item 5): the 4 time shards
    # drain in TWO micro-batches instead of four. Every per-batch fixed
    # cost halves — offset/commit WAL rounds, 32 state-store delta
    # commits per batch, the stateful Python worker protocol round —
    # while the run stays genuinely multi-batch: the watermark advances
    # between the two batches, so event-time timers still fire mid-
    # stream (pinned by test_stateful_stream_fires_timers_and_clears_
    # state). Result equivalence is batch-split-independent: the
    # processor concatenates+sorts each batch's chunks, state carries
    # sessions across the boundary, and the final collapse keeps the
    # MAX per (user, session_start) — same sessions for ANY
    # time-contiguous split (the same argument as the r14 CDC
    # latest-image apply; oracle-pinned at two SFs).
    sessions = _stateful_sessions_stream(
        spark, sf_dir, _timer_marker_dir, max_files_per_trigger=2
    )
    # NO input_rows: Python-stateful — see stream_stateful_counts
    # (A/B: 8.0 s session-width vs 11.9 s at the derived 4 partitions).
    _run_to_memory(sessions, "stream_stateful_custom_sink", "update")
    s = spark.table("stream_stateful_custom_sink")
    return _collapse_provisional_sessions(s)


def _stateful_sessions_stream(
    spark: SparkSession,
    sf_dir: str,
    marker_dir: str | None = None,
    max_files_per_trigger: int | None = 1,
    n_shards: int = 4,
) -> DataFrame:
    """Unstarted update-mode stream for the timer-based session
    aggregator; parametric batch granularity so the throughput bench
    (scripts/bench_stream_throughput.py) can sweep maxFilesPerTrigger
    over a deeper shard ladder while the registered query keeps its
    4-shard, one-file-per-batch contract."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_ms = 30 * 60 * 1_000
    unit = _events_ts_unit(sf_dir)
    if unit == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(_events_raw_schema(unit))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(_time_sharded_stream_dir(sf_dir, n_shards))
    # Project to the 3 columns the processor reads BEFORE the stateful
    # op (guide §4): applyInPandasWithState is a black box to Catalyst
    # (its references are the whole child output), so without this
    # select every event column — including the fat `props` JSON string
    # — crosses the groupBy shuffle and the Arrow boundary per batch.
    events = (
        _bridge_ts(raw, unit)
        .select("user_id", "ts", "event_id")
        .withWatermark("ts", "30 minutes")
    )

    def track_sessions(key, pdfs, state):
        import pandas as pd

        user_id = key[0]
        out_start, out_end, out_n = [], [], []

        def emit(start_us: int, end_us: int, n: int) -> None:
            out_start.append(start_us)
            out_end.append(end_us)
            out_n.append(n)

        if state.hasTimedOut:
            start_us, end_us, n = state.get
            emit(start_us, end_us, n)
            state.remove()
            if marker_dir is not None:
                open(f"{marker_dir}/timer_{user_id}_{start_us}", "w").close()
        else:
            cur = list(state.get) if state.exists else None
            # Concatenate ALL of this batch's chunks before sorting: when
            # a micro-batch spans several input files, the key's rows
            # arrive as arbitrarily interleaved Arrow chunks and
            # per-chunk sorting silently splits sessions (caught by the
            # r9 throughput bench: 300,998 vs the true 300,893 sessions
            # on the 10x corpus at maxFilesPerTrigger=4/unbounded; the
            # registered 1-file-per-batch contract masked it).
            import pandas as _pd

            chunks = [p for p in pdfs if len(p)]
            batch = (
                _pd.concat(chunks).sort_values(["ts", "event_id"])
                if chunks
                else None
            )
            if batch is not None:
                ts_us = (batch["ts"].astype("int64") // 1_000).to_numpy()
                for t in ts_us:
                    t = int(t)
                    if cur is None:
                        cur = [t, t, 0]
                    elif t - cur[1] > gap_ms * 1_000:
                        emit(*cur)
                        cur = [t, t, 0]
                    cur[1] = t
                    cur[2] += 1
            if cur is not None:
                emit(*cur)  # provisional open-session row (superseded later)
                state.update(tuple(cur))
                # Timer strictly after the current watermark (Spark
                # rejects earlier timestamps); max() keeps the intended
                # end+gap whenever it is still in the future.
                state.setTimeoutTimestamp(
                    max(cur[1] // 1_000 + gap_ms, state.getCurrentWatermarkMs() + 1)
                )
        yield pd.DataFrame(
            {
                "user_id": pd.Series([user_id] * len(out_n), dtype="int64"),
                "session_start": pd.Series(out_start, dtype="int64"),
                "session_end": pd.Series(out_end, dtype="int64"),
                "n_events": pd.Series(out_n, dtype="int64"),
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        track_sessions,
        outputStructType="user_id long, session_start long, session_end long, n_events long",
        stateStructType="start_us long, end_us long, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _collapse_provisional_sessions(s: DataFrame) -> DataFrame:
    # Collapse provisional emissions (same user+start, growing end/n),
    # then number sessions per user in start order — O(sessions) rows.
    from pyspark.sql import Window

    final = s.groupBy("user_id", "session_start").agg(
        F.max("session_end").alias("end_us"), F.max("n_events").alias("n_events")
    )
    w = Window.partitionBy("user_id").orderBy("session_start")
    return final.select(
        "user_id",
        F.row_number().over(w).cast("bigint").alias("session_seq"),
        F.timestamp_micros(F.col("session_start")).alias("session_start"),
        F.timestamp_micros(F.col("end_us")).alias("session_end"),
        "n_events",
    )


@register(
    "stream_versioned_sink",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           3 AS n_versions,
           TRUE AS retry_skipped
    FROM events
    """,
    tags=("streaming", "sink", "snapshot", "live", "exactly-once"),
    doc=(
        "EXACTLY-ONCE streaming sink into the versioned store: a real "
        "3-batch availableNow stream (maxFilesPerTrigger=1 over the "
        "sharded events source) lands each micro-batch through "
        "foreachBatch + versioned_write_txn, whose manifest txn "
        "metadata (app_id, batch_id) makes replays no-ops — the Delta "
        "txnAppId/txnVersion idempotent-commit contract. After the "
        "stream drains, the LAST batch is deliberately re-applied with "
        "its committed batch_id and the oracle-pinned retry_skipped "
        "flag proves the duplicate was refused (version count "
        "unchanged). The final table equals the full events set with "
        "one version per micro-batch. Completes the loop opened by "
        "stream_versioned_ingest: the store is now both a streaming "
        "source AND an exactly-once streaming sink."
    ),
)
def stream_versioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: each micro-batch commit is one segment write + an O(1)
    manifest append; the idempotency check reads only manifest
    metadata. Recovery after a crash between segment write and
    manifest commit clears the orphaned directory — the manifest is
    the single atomic commit point, so replays never double-count."""
    import os
    import shutil
    import tempfile

    from argodb_mapreduce_spark.sources.versioned import (
        _read_manifest,
        snapshot_read,
        versioned_write_txn,
        versions,
    )

    unit = _events_ts_unit(sf_dir)
    if unit == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(_events_raw_schema(unit))
        .option("maxFilesPerTrigger", 1)
        .parquet(_sharded_stream_dir(sf_dir))
    )
    events = _bridge_ts(raw, unit).select("event_id", "user_id", "value")

    tag = sf_dir.strip("/").replace("/", "_")
    out = os.path.join(
        tempfile.gettempdir(), "argodb_mapreduce_spark", tag, "events_vsink"
    )
    # Rebuild per run: the query must be deterministic under re-execution.
    shutil.rmtree(out, ignore_errors=True)
    ckpt = tempfile.mkdtemp(prefix="stream_vsink_ckpt_")
    app_id = "stream_versioned_sink"

    def sink_batch(batch_df: DataFrame, batch_id: int) -> None:
        versioned_write_txn(batch_df, out, app_id, batch_id)

    run_stream_resilient(
        lambda: events.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )

    # Replay the last committed batch: exactly-once means a no-op.
    n_versions = len(versions(out))
    last_bid = _read_manifest(out)[-1]["txn"]["batch_id"]
    _, committed = versioned_write_txn(
        snapshot_read(spark, out).limit(1), out, app_id, last_bid
    )
    retry_skipped = (not committed) and len(versions(out)) == n_versions

    return snapshot_read(spark, out).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("event_id").cast("long").alias("sum_event_id"),
        F.countDistinct("user_id").alias("n_users"),
        F.lit(n_versions).alias("n_versions"),
        F.lit(retry_skipped).alias("retry_skipped"),
    )


#: Streaming-expectation thresholds (distribution-stable on events.value,
#: range ~[0, 490] at every SF): <100 passes, [100, 200) is repairable
#: by the clamp, >=200 stays quarantined.
_EXPECT_VALUE_CAP = 100.0
_EXPECT_FIXABLE = 200.0


@register(
    "stream_expect_quarantine_live",
    oracle=f"""
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM events
             WHERE value < {_EXPECT_FIXABLE}) AS n_main,
           (SELECT CAST(SUM(event_id) AS BIGINT) FROM events
             WHERE value < {_EXPECT_FIXABLE}) AS sum_key_main,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM events
             WHERE value >= {_EXPECT_VALUE_CAP}
               AND value < {_EXPECT_FIXABLE}) AS reingested,
           CAST(COUNT(*) AS BIGINT) AS still_quarantined,
           0 AS second_reingested
    FROM events WHERE value >= {_EXPECT_FIXABLE}
    """,
    tags=("streaming", "sink", "constraint", "data-quality", "quarantine", "live"),
    doc=(
        "The FULL STREAMING DLT LOOP in one query: a real multi-batch "
        "(3 shards, 2 per trigger) availableNow stream lands through foreachBatch + "
        "versioned_write_expect —each micro-batch's CHECK-violating rows "
        "route to the sidecar quarantine table instead of failing the "
        "batch — then quarantine_replay re-validates them through a "
        "deterministic repair (clamp values under 200 below the cap), "
        "commits the now-passing subset exactly once, and republishes "
        "the residue; a SECOND replay is oracle-pinned to reingest "
        "nothing, and both foreachBatch legs are txn-stamped so a "
        "replayed micro-batch re-runs only a leg that never landed. "
        "ingest -> expect -> quarantine -> repair -> replay, all on "
        "this repo's own primitives, all hash-checked."
    ),
)
def stream_expect_quarantine_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the split is two codegen predicate passes per BATCH; the
    replay scans the quarantine (O(bad rows)); every commit is one
    manifest append; both foreachBatch legs carry the txn stamp, so
    micro-batch replays are per-leg no-ops (exactly-once)."""
    import os
    import shutil
    import tempfile

    from argodb_mapreduce_spark.sources.versioned import (
        add_constraint,
        quarantine_replay,
        snapshot_read,
        versioned_write_expect,
    )

    unit = _events_ts_unit(sf_dir)
    if unit == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # 2 files per trigger (r15, same lever as stream_stateful_custom):
    # the 3 shards land in TWO micro-batches instead of three — one
    # fewer trigger round and two fewer txn-stamped commits (each batch
    # commits a main + a quarantine leg) while the run stays genuinely
    # multi-batch. The expect/quarantine split is a per-row predicate
    # and both legs are txn-stamped per batch_id, so the final tables
    # (and the replay arithmetic) are batch-split-independent.
    raw = (
        spark.readStream.schema(_events_raw_schema(unit))
        .option("maxFilesPerTrigger", 2)
        .parquet(_sharded_stream_dir(sf_dir))
    )
    events = _bridge_ts(raw, unit).select("event_id", "user_id", "value")

    tag = sf_dir.strip("/").replace("/", "_")
    out = os.path.join(
        tempfile.gettempdir(), "argodb_mapreduce_spark", tag, "events_expect_stream"
    )
    qp = out + "_quarantine"
    # Rebuild per run: replay mutates both tables.
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(qp, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    add_constraint(spark, out, "value_cap", f"value < {_EXPECT_VALUE_CAP}")
    ckpt = tempfile.mkdtemp(prefix="stream_expect_ckpt_")

    app_id = "stream_expect_quarantine"

    def sink_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Each leg carries the txn stamp, so a replayed micro-batch (or
        # a crash between the two legs) re-runs only the leg that never
        # landed — exactly-once on BOTH tables.
        versioned_write_expect(
            batch_df,
            out,
            on_violation="quarantine",
            quarantine_path=qp,
            _txn={"app_id": app_id, "batch_id": batch_id},
        )

    run_stream_resilient(
        lambda: events.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )

    def repair(d: DataFrame) -> DataFrame:
        return d.withColumn(
            "value",
            F.when(
                (F.col("value") >= _EXPECT_VALUE_CAP)
                & (F.col("value") < _EXPECT_FIXABLE),
                F.lit(_EXPECT_VALUE_CAP - 0.01),
            ).otherwise(F.col("value")),
        )

    rep1 = quarantine_replay(spark, out, qp, repair=repair)
    rep2 = quarantine_replay(spark, out, qp, repair=repair)
    main = snapshot_read(spark, out).agg(
        F.count(F.lit(1)).alias("n_main"),
        F.sum("event_id").cast("long").alias("sum_key_main"),
    )
    return main.select(
        "n_main",
        "sum_key_main",
        F.lit(rep1["rows_reingested"]).cast("long").alias("reingested"),
        F.lit(rep1["rows_still_quarantined"]).cast("long").alias("still_quarantined"),
        F.lit(rep2["rows_reingested"]).cast("long").alias("second_reingested"),
    )


@register(
    "stream_mv_maintenance",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           3 AS n_refreshes,
           TRUE AS post_bootstrap_incremental
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    LIMIT 20
    """,
    tags=("streaming", "mv", "incremental", "live", "exactly-once"),
    doc=(
        "CONTINUOUS MATERIALIZED-VIEW MAINTENANCE: each micro-batch of "
        "a real 3-batch stream lands in the versioned base table "
        "through the exactly-once txn sink, then the stored MV "
        "(count + sum per user) refreshes INCREMENTALLY off the new "
        "segment — after the bootstrap, every refresh is O(batch), "
        "never O(base), and the refresh count is oracle-pinned. The "
        "final MV equals a from-scratch aggregate over all events — "
        "the Delta Live Tables / dynamic-table pattern composed "
        "entirely from this repo's own primitives (txn sink + manifest "
        "delta detection + mergeable-partial refresh)."
    ),
)
def stream_mv_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: per batch, one segment write + one O(batch) delta
    aggregate + a shuffle of |MV| + |batch groups| rows. The MV is
    itself versioned, so dashboard readers pin a consistent refresh
    while the next one publishes."""
    import os
    import shutil
    import tempfile

    from argodb_mapreduce_spark.operators.materialized_view import (
        mv_create,
        mv_refresh,
    )
    from argodb_mapreduce_spark.sources.versioned import (
        snapshot_read,
        versioned_write_txn,
    )

    unit = _events_ts_unit(sf_dir)
    if unit == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(_events_raw_schema(unit))
        .option("maxFilesPerTrigger", 1)
        .parquet(_sharded_stream_dir(sf_dir))
    )
    events = _bridge_ts(raw, unit).select("event_id", "user_id")

    tag = sf_dir.strip("/").replace("/", "_")
    base = os.path.join(
        tempfile.gettempdir(), "argodb_mapreduce_spark", tag, "events_mv_base"
    )
    mv = os.path.join(
        tempfile.gettempdir(), "argodb_mapreduce_spark", tag, "events_mv_live"
    )
    shutil.rmtree(base, ignore_errors=True)
    shutil.rmtree(mv, ignore_errors=True)
    ckpt = tempfile.mkdtemp(prefix="stream_mv_ckpt_")
    modes: list[str] = []

    def land_and_refresh(batch_df: DataFrame, batch_id: int) -> None:
        _, committed = versioned_write_txn(
            batch_df, base, "stream_mv_maintenance", batch_id
        )
        if not committed:
            return  # replayed batch: base unchanged, MV already reflects it
        if not os.path.exists(os.path.join(mv, "_mv.json")):
            mv_create(batch_df.sparkSession, base, mv, ["user_id"], ["event_id"])
            modes.append("bootstrap")
        else:
            modes.append(mv_refresh(batch_df.sparkSession, mv)["mode"])

    run_stream_resilient(
        lambda: events.writeStream.foreachBatch(land_and_refresh)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    # 3 shards -> 3 batches: one bootstrap (the MV creation covers
    # batch 0) then every later batch refreshes INCREMENTALLY — the
    # steady state the op exists to prove.
    post_bootstrap_incremental = modes[0] == "bootstrap" and all(
        m == "incremental" for m in modes[1:]
    )
    return (
        snapshot_read(spark, mv)
        .orderBy("user_id")
        .limit(20)
        .select(
            "user_id",
            "n_rows",
            F.col("sum_event_id"),
            F.lit(len(modes)).alias("n_refreshes"),
            F.lit(post_bootstrap_incremental).alias("post_bootstrap_incremental"),
        )
    )
