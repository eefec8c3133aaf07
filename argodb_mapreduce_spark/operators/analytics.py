"""Event-analytics operators: rolling distinct counts and cohort
retention (SURVEY.md §2.B3/B5 composite shapes).

Two aggregation shapes every product-analytics workload needs that
don't map to a single built-in:

- `events_rolling_distinct` — 7-day rolling distinct active users per
  day. Spark windows cannot express COUNT(DISTINCT) OVER RANGE; the
  scalable rewrite is: reduce to distinct (user, day) pairs first (the
  big shuffle, heavily combiner-reduced), then fan each pair out to the
  ≤7 window end-days it contributes to (bounded 7× explode of the
  *reduced* set, not the raw events) and count distinct per end-day.
  Shuffle volume is O(user-days × 7), independent of raw event count —
  this survives 100 TB of events, where a naive per-day set-union or a
  collect_set window would not.

- `events_retention` — weekly cohort retention: users grouped by their
  first active week, counted per subsequent week offset. Two shuffles
  (per-user min week, then the cohort×offset count); the user→cohort
  join is keyed on user_id and AQE picks broadcast when the user
  dimension fits (no hard hint — user counts scale with the data;
  VERDICT r1 finding 5).

These extend the reference's delegated reduce surface (SURVEY.md
§2.B3: arbitrary user keying over scanned rows) with the canonical
analytics keyings made first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from argodb_mapreduce_spark.catalog import load_table
from argodb_mapreduce_spark.functions.rank_stats import rank_histogram
from argodb_mapreduce_spark.registry import register

ROLLING_DAYS = 7


@register(
    "events_rolling_distinct",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), days AS (
      SELECT DISTINCT day FROM ud
    ), contrib AS (
      SELECT user_id, day + CAST(i AS INT) AS end_day
      FROM ud, UNNEST(range(0, {ROLLING_DAYS})) AS u(i)
    )
    -- TIMESTAMP contract type: Spark DateType reaches pandas as object
    -- dates vs DuckDB's datetime64 — a driver-hash mismatch (same for
    -- retention/sketch weeks below).
    SELECT CAST(d.day AS TIMESTAMP) AS day,
           CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS rolling_{ROLLING_DAYS}d_users
    FROM days d JOIN contrib c ON c.end_day = d.day
    GROUP BY d.day
    """,
    tags=("analytics", "window", "distinct"),
    doc=(
        f"Rolling {ROLLING_DAYS}-day distinct active users per day — the "
        "COUNT(DISTINCT) OVER RANGE shape Spark windows can't express, "
        "rewritten as distinct user-days → bounded fan-out to window "
        "end-days → per-day distinct count. Shuffles O(user-days × "
        f"{ROLLING_DAYS}), never O(events)."
    ),
)
def events_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ud = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = ud.select("day").distinct()
    contrib = ud.select(
        "user_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(ROLLING_DAYS - 1)),
                lambda i: F.date_add(F.col("day"), i),
            )
        ).alias("end_day"),
    )
    return (
        days.join(contrib, days.day == contrib.end_day)
        .groupBy(days.day)
        .agg(F.count_distinct("user_id").alias(f"rolling_{ROLLING_DAYS}d_users"))
        .select(F.col("day").cast("timestamp").alias("day"), f"rolling_{ROLLING_DAYS}d_users")
    )


@register(
    "events_retention",
    oracle="""
    WITH uw AS (
      -- DuckDB's date_trunc('week') yields DATE while Spark's yields
      -- TIMESTAMP; both sides cast to DATE so the contract types align.
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events
    ), cohorts AS (
      SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id
    )
    SELECT CAST(c.cohort_week AS TIMESTAMP) AS cohort_week,
           CAST(date_diff('day', c.cohort_week, u.week) // 7 AS INT) AS week_offset,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS n_active
    FROM uw u JOIN cohorts c USING (user_id)
    GROUP BY c.cohort_week, CAST(date_diff('day', c.cohort_week, u.week) // 7 AS INT)
    """,
    tags=("analytics", "retention"),
    doc=(
        "Weekly cohort retention: distinct user-weeks → per-user first "
        "week (the cohort) → distinct active users per (cohort, week "
        "offset). The classic triangular retention matrix in two "
        "combiner-reduced shuffles; the cohort join has no broadcast "
        "hint — user cardinality scales with the corpus, AQE decides."
    ),
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    uw = e.select("user_id", F.to_date(F.date_trunc("week", "ts")).alias("week")).distinct()
    cohorts = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        uw.join(cohorts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7).cast("int").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
        .select(F.col("cohort_week").cast("timestamp").alias("cohort_week"), "week_offset", "n_active")
    )


@register(
    "sketch_rollup_hll",
    oracle="""
    SELECT CAST(CAST(date_trunc('week', ts) AS DATE) AS TIMESTAMP) AS week,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_5pct
    FROM events
    GROUP BY CAST(date_trunc('week', ts) AS DATE)
    """,
    tags=("analytics", "sketch", "approx"),
    doc=(
        "Re-aggregatable sketch rollup: per-day HLL sketches of user_id "
        "(the stored pre-aggregate) union-merged into weekly distinct "
        "estimates via hll_union_agg — the pattern that lets a 100 TB "
        "warehouse answer distinct-count rollups from kilobyte sketches "
        "instead of re-scanning raw events. The estimate is checked "
        "in-query against the exact distinct (≤5%); the contract row "
        "emits deterministic columns + the pass flag (the sketch "
        "estimate itself is engine-internal, same treatment as "
        "agg_approx_count_distinct)."
    ),
)
def sketch_rollup_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    weekly_est = daily.groupBy(
        F.to_date(F.date_trunc("week", "day")).alias("week")
    ).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
    )
    exact = e.groupBy(
        F.to_date(F.date_trunc("week", "ts")).alias("week")
    ).agg(F.count_distinct("user_id").alias("exact_users"))
    return weekly_est.join(exact, "week").select(
        F.col("week").cast("timestamp").alias("week"),
        "n_days",
        "exact_users",
        (
            F.abs(F.col("est_users") - F.col("exact_users")) / F.col("exact_users") <= 0.05
        ).alias("within_5pct"),
    )


@register(
    "window_time_range_frame",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS VARCHAR) AS DOUBLE) AS rolling_1h_sum,
           CAST(COUNT(*) OVER w AS BIGINT) AS rolling_1h_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    tags=("analytics", "window", "time"),
    doc=(
        "Event-time RANGE frame: per-user rolling 1-hour sum/count — the "
        "time-interval window Spark expresses as rangeBetween over epoch "
        "microseconds (RANGE peers = identical timestamps, same frame "
        "semantics both engines). One shuffle on user_id; frame "
        "evaluation is streaming within the sorted partition. Sums go "
        "through the exact-decimal pattern so sliding-frame evaluation "
        "order can't change results."
    ),
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    hour_us = 3_600_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-hour_us, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("rolling_1h_sum"),
        F.count(F.lit(1)).over(w).alias("rolling_1h_n"),
    )


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS s,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sq
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           (e.value - s.s / s.n) / SQRT((s.sq - s.s * s.s / s.n) / (s.n - 1)) AS z
    FROM events e JOIN stats s USING (event_type)
    WHERE ABS((e.value - s.s / s.n) / SQRT((s.sq - s.s * s.s / s.n) / (s.n - 1))) > 3.0
    """,
    tags=("analytics", "anomaly"),
    doc=(
        "Z-score anomaly screen: per-event_type mean/stddev computed "
        "once (exact decimal sums — order-independent), broadcast back "
        "onto the event scan, rows beyond 3σ flagged. The two-pass "
        "stats-join-back shape: the stats side is O(event types) and "
        "broadcast, so the 100 TB scan is touched once with no shuffle "
        "of the fact rows. All row-level arithmetic is single-value IEEE "
        "ops on identical inputs — bit-identical across engines."
    ),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("s"),
        F.sum(dec * dec).cast("double").alias("sq"),
    )
    mean = F.col("s") / F.col("n")
    std = F.sqrt((F.col("sq") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1))
    z = (F.col("value") - mean) / std
    return (
        e.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) > 3.0)
    )


@register(
    "events_gapfill",
    oracle="""
    WITH obs AS (
      SELECT user_id,
             CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS h,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS hour_value
      FROM events GROUP BY 1, 2
    ),
    span AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM obs GROUP BY user_id),
    grid AS (SELECT user_id, u.h FROM span, UNNEST(range(h0, h1 + 1)) AS u(h))
    SELECT g.user_id,
           g.h AS hour_epoch,
           COALESCE(o.n_events, 0) AS n_events,
           LAST_VALUE(o.hour_value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.h ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.h = g.h
    """,
    tags=("timeseries", "window", "events"),
    doc=(
        "Time-series gap-fill + forward-fill (the hypertable densify "
        "shape): hourly per-user buckets, a generated dense hour grid "
        "between each user's first and last activity, and LAST_VALUE "
        "IGNORE NULLS carrying the most recent observed hourly sum "
        "across silent hours. Grid generation is a bounded per-user "
        "sequence explode (span-hours rows, independent of raw event "
        "count); the fill is one window per user — no driver state, "
        "no self-join per gap. Hour sums use the exact-decimal pattern "
        "so fill values are bit-identical across engines."
    ),
)
def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from argodb_mapreduce_spark.functions.oracle_safe import dsum

    e = load_table(spark, sf_dir, "events")
    obs = (
        e.select(
            "user_id",
            (F.unix_timestamp(F.date_trunc("hour", "ts")) / 3600).cast("long").alias("h"),
            "value",
        )
        .groupBy("user_id", "h")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("hour_value"))
    )
    span = obs.groupBy("user_id").agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = span.select("user_id", F.explode(F.sequence("h0", "h1")).alias("h"))
    joined = grid.join(obs, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("h").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.col("h").alias("hour_epoch"),
        F.coalesce("n_events", F.lit(0).cast("long")).alias("n_events"),
        F.last("hour_value", ignorenulls=True).over(w).alias("filled_value"),
    )


#: EWMA taps and decay. alpha = 1/2 makes every weight a power of two,
#: so each weighted term is an EXACT double multiply (exponent shift) —
#: the decay choice that keeps a float smoother engine-exact.
EWMA_TAPS = 8


def _ewma_sql() -> str:
    num = "COALESCE(x0, CAST(0 AS DOUBLE))"
    den = "CASE WHEN x0 IS NULL THEN CAST(0 AS DOUBLE) ELSE CAST(1 AS DOUBLE) END"
    for k in range(1, EWMA_TAPS):
        wgt = 2.0 ** -k
        num = f"({num} + COALESCE(x{k}, CAST(0 AS DOUBLE)) * {wgt!r})"
        den = f"({den} + CASE WHEN x{k} IS NULL THEN CAST(0 AS DOUBLE) ELSE {wgt!r} END)"
    lags = ",\n             ".join(
        f"LAG(value, {k}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS x{k}"
        for k in range(EWMA_TAPS)
    )
    return f"""
    WITH lagged AS (
      SELECT user_id, ts, event_id, value,
             {lags}
      FROM events
    )
    SELECT user_id, ts, event_id, value, {num} / {den} AS ewma
    FROM lagged
    """


@register(
    "events_ewma_smooth",
    oracle=_ewma_sql(),
    tags=("events", "window", "timeseries"),
    doc=(
        f"Exponentially weighted moving average (alpha=1/2, "
        f"{EWMA_TAPS} taps) per user stream, renormalized over the "
        "taps actually present so the series starts unbiased. The "
        "power-of-two decay makes every weighted term an exact double "
        "op, and the explicit left-to-right association makes the sum "
        "bit-identical across engines — a float window smoother that "
        "needs no grid-sum escape hatch."
    ),
)
def events_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values — the smoothing half of the
    anomaly pack (zscore/MAD flag outliers; this tracks level).

    Scale design: one shuffle on user_id; all taps ride a single
    window sort (Catalyst plans one Window operator for the 8 lags),
    then the arithmetic is map-side. A truncated-tap EWMA (vs the
    recursive form) is what keeps the operator a stateless window op —
    the recursive EWMA needs applyInPandasWithState and breaks
    SQL-oracle parity; 8 taps of alpha=1/2 reach within 2^-8 of the
    infinite-history value, below any monitoring threshold.
    """
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = e.select(
        "user_id", "ts", "event_id", "value",
        *[F.lag("value", k).over(w).alias(f"x{k}") for k in range(EWMA_TAPS)],
    )
    num = F.coalesce(F.col("x0"), F.lit(0.0))
    den = F.when(F.col("x0").isNull(), F.lit(0.0)).otherwise(F.lit(1.0))
    for k in range(1, EWMA_TAPS):
        wgt = 2.0 ** -k
        num = num + F.coalesce(F.col(f"x{k}"), F.lit(0.0)) * F.lit(wgt)
        den = den + F.when(F.col(f"x{k}").isNull(), F.lit(0.0)).otherwise(F.lit(wgt))
    return lagged.select(
        "user_id", "ts", "event_id", "value", (num / den).alias("ewma")
    )


#: ACF grid: deviation products of daily counts stay well under 2^43
#: at any fixture SF, so 20 fractional bits keeps each scaled term
#: inside BIGINT while quantizing at ~1e-6 — identical on both engines.
ACF_GRID_BITS = 20
ACF_MAX_LAG = 7


def _acf_sql() -> str:
    from argodb_mapreduce_spark.functions.oracle_safe import sql_gsum

    num = sql_gsum(
        "(CAST(p.xa AS DOUBLE) - m.xbar) * (CAST(p.xb AS DOUBLE) - m.xbar)",
        ACF_GRID_BITS,
    )
    den = sql_gsum("(CAST(cnt AS DOUBLE) - xbar) * (CAST(cnt AS DOUBLE) - xbar)", ACF_GRID_BITS)
    return f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1
    ), m AS (
      SELECT CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS xbar FROM daily
    ), den AS (
      SELECT {den} AS den FROM daily, m
    ), lags AS (
      SELECT CAST(k AS INT) AS lag FROM UNNEST(range(1, {ACF_MAX_LAG + 1})) AS t(k)
    ), pairs AS (
      SELECT l.lag, a.cnt AS xa, b.cnt AS xb
      FROM daily a JOIN lags l ON TRUE
      JOIN daily b ON b.day = a.day + l.lag
    )
    SELECT p.lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ({num}) / ANY_VALUE(d.den) AS acf
    FROM pairs p, m, den d
    GROUP BY p.lag
    """


@register(
    "events_autocorrelation",
    oracle=_acf_sql(),
    tags=("events", "timeseries", "statistics"),
    doc=(
        f"Autocorrelation function of the daily event-count series at "
        f"lags 1..{ACF_MAX_LAG}: ACF(k) = sum((x_t-x̄)(x_(t+k)-x̄)) / "
        "sum((x_t-x̄)²), the standard seasonality probe (a weekly cycle "
        "shows as an ACF(7) peak). Centered moments ride the "
        f"2^-{ACF_GRID_BITS} grid so the coefficients are bit-identical "
        "across engines and parallelism."
    ),
)
def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-series ACF at lags 1..7 — the seasonality detector next to
    the trend (orders_ols_trend) and level (events_ewma_smooth) ops.

    Scale design: pass 1 reduces the event fact to one row per day
    (map-combinable count; O(days) output — the series length grows
    with TIME, not data volume, so everything downstream is tiny no
    matter the corpus size). The lag table and the 1-row mean/denominator
    aggregates broadcast onto the per-day rows; the lag-k pairing is a
    self-join of the O(days) series shifted by calendar date. Integer
    day counts make x̄ an exact sum/count division; the centered
    products use grid sums, so ACF is deterministic at any parallelism.
    """
    from argodb_mapreduce_spark.functions.oracle_safe import gsum

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = daily.agg(
        (F.sum("cnt").cast("double") / F.count(F.lit(1))).alias("xbar")
    )
    dev = F.col("cnt").cast("double") - F.col("xbar")
    den = (
        daily.crossJoin(F.broadcast(m))
        .agg(gsum(dev * dev, ACF_GRID_BITS).alias("den"))
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").cast("int").alias("lag"))
    a = daily.select(F.col("day").alias("a_day"), F.col("cnt").alias("xa"))
    b = daily.select(F.col("day").alias("b_day"), F.col("cnt").alias("xb"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("b_day") == F.date_add(F.col("a_day"), F.col("lag")))
    )
    da = F.col("xa").cast("double") - F.col("xbar")
    db = F.col("xb").cast("double") - F.col("xbar")
    return (
        pairs.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(den))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            (gsum(da * db, ACF_GRID_BITS) / F.any_value("den")).alias("acf"),
        )
        .select("lag", "n_pairs", "acf")
    )


@register(
    "events_ab_welch_t",
    oracle="""
    WITH s AS (
      SELECT
        CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(CAST(SUM(CASE WHEN user_id % 2 = 0 THEN CAST(value AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE) AS sx_a,
        CAST(CAST(SUM(CASE WHEN user_id % 2 = 1 THEN CAST(value AS DECIMAL(18,2)) END) AS VARCHAR) AS DOUBLE) AS sx_b,
        CAST(CAST(SUM(CASE WHEN user_id % 2 = 0 THEN CAST(value * value AS DECIMAL(18,4)) END) AS VARCHAR) AS DOUBLE) AS sx2_a,
        CAST(CAST(SUM(CASE WHEN user_id % 2 = 1 THEN CAST(value * value AS DECIMAL(18,4)) END) AS VARCHAR) AS DOUBLE) AS sx2_b
      FROM events
    ), m AS (
      SELECT n_a, n_b,
             sx_a / n_a AS mean_a, sx_b / n_b AS mean_b,
             (sx2_a - sx_a * sx_a / n_a) / NULLIF(n_a - 1, 0) AS var_a,
             (sx2_b - sx_b * sx_b / n_b) / NULLIF(n_b - 1, 0) AS var_b
      FROM s
    )
    SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,
           (mean_a - mean_b) / NULLIF(SQRT(var_a / n_a + var_b / n_b), 0) AS t_stat,
           ((var_a / n_a + var_b / n_b) * (var_a / n_a + var_b / n_b))
             / NULLIF((var_a / n_a) * (var_a / n_a) / NULLIF(n_a - 1, 0)
                + (var_b / n_b) * (var_b / n_b) / NULLIF(n_b - 1, 0), 0) AS df
    FROM m
    """,
    tags=("analytics", "statistics", "experiment"),
    doc=(
        "Welch two-sample t statistic between deterministic A/B halves "
        "of the event stream (variant = user_id parity): exact-decimal "
        "sums and sums-of-squares in ONE conditional aggregate pass, "
        "then mean/variance/t/df as fixed-association IEEE scalar ops — "
        "the experiment-analysis readout, bit-identical on both engines."
    ),
)
def events_ab_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout over events.value.

    Scale design: ONE scan of the fact table with six conditional
    map-combinable aggregates (no per-variant shuffle split, no second
    pass); everything after is scalar arithmetic on a 1-row frame. The
    sum-of-squares variance form keeps the pass single; the decimal
    casts make it order-independent, so the t statistic is identical at
    any parallelism. Assignment by user_id parity is the deterministic
    stand-in for a real experiment-assignment column — swap the
    predicate for the column and the plan shape is unchanged.
    """
    e = load_table(spark, sf_dir, "events")
    is_a = F.col("user_id") % 2 == 0
    s = e.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~is_a, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(is_a, F.col("value").cast("decimal(18,2)"))).cast("double").alias("sx_a"),
        F.sum(F.when(~is_a, F.col("value").cast("decimal(18,2)"))).cast("double").alias("sx_b"),
        F.sum(F.when(is_a, (F.col("value") * F.col("value")).cast("decimal(18,4)"))).cast("double").alias("sx2_a"),
        F.sum(F.when(~is_a, (F.col("value") * F.col("value")).cast("decimal(18,4)"))).cast("double").alias("sx2_b"),
    )
    # NULLIF guards mirror the oracle: n=1 makes (n-1)=0 and identical
    # samples make the pooled SE 0 — DuckDB IEEE division would yield
    # inf/NaN while Spark's Divide yields NULL, so both engines null the
    # zero denominators explicitly for exact degenerate-input parity.
    m = s.select(
        "n_a", "n_b",
        (F.col("sx_a") / F.col("n_a")).alias("mean_a"),
        (F.col("sx_b") / F.col("n_b")).alias("mean_b"),
        (
            (F.col("sx2_a") - F.col("sx_a") * F.col("sx_a") / F.col("n_a"))
            / F.nullif(F.col("n_a") - 1, F.lit(0))
        ).alias("var_a"),
        (
            (F.col("sx2_b") - F.col("sx_b") * F.col("sx_b") / F.col("n_b"))
            / F.nullif(F.col("n_b") - 1, F.lit(0))
        ).alias("var_b"),
    )
    se_a = F.col("var_a") / F.col("n_a")
    se_b = F.col("var_b") / F.col("n_b")
    return m.select(
        "n_a", "n_b", "mean_a", "mean_b", "var_a", "var_b",
        ((F.col("mean_a") - F.col("mean_b")) / F.nullif(F.sqrt(se_a + se_b), F.lit(0.0))).alias("t_stat"),
        (
            ((se_a + se_b) * (se_a + se_b))
            / F.nullif(
                se_a * se_a / F.nullif(F.col("n_a") - 1, F.lit(0))
                + se_b * se_b / F.nullif(F.col("n_b") - 1, F.lit(0)),
                F.lit(0.0),
            )
        ).alias("df"),
    )


CUSUM_GRID_BITS = 20
CUSUM_SIGMA_K = 2.0


def _cusum_sql() -> str:
    from argodb_mapreduce_spark.functions.oracle_safe import sql_gsum

    g = float(1 << CUSUM_GRID_BITS)
    var = sql_gsum("(CAST(cnt AS DOUBLE) - xbar) * (CAST(cnt AS DOUBLE) - xbar)", CUSUM_GRID_BITS)
    return f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1
    ), m AS (
      SELECT CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS xbar,
             SQRT(({var}) / COUNT(*)) AS sigma
      FROM daily, (SELECT CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS xbar FROM daily) mm
    ), gridded AS (
      SELECT d.day, d.cnt,
             CAST(ROUND((CAST(d.cnt AS DOUBLE) - m.xbar) * {g!r}) AS BIGINT) AS gdev
      FROM daily d, m
    )
    SELECT CAST(g.day AS TIMESTAMP) AS day, g.cnt,
           CAST(SUM(g.gdev) OVER (ORDER BY g.day) AS DOUBLE) / {g!r} AS cusum,
           ABS(CAST(SUM(g.gdev) OVER (ORDER BY g.day) AS DOUBLE) / {g!r})
             > {CUSUM_SIGMA_K!r} * ANY_VALUE(m.sigma) OVER () AS flagged
    FROM gridded g, m
    """


@register(
    "events_cusum_changepoint",
    oracle=_cusum_sql(),
    tags=("events", "timeseries", "anomaly"),
    doc=(
        "CUSUM level-shift detector on the daily event-count series: "
        "running sum of mean-deviations, flagged where |CUSUM| exceeds "
        f"{CUSUM_SIGMA_K}σ — the drift alarm that catches slow shifts "
        "z-score screens miss. Deviations are grid-rounded to integers "
        "BEFORE the running sum, so the cumulative is an exact integer "
        "window sum — engine window-aggregation order cannot drift it."
    ),
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completes the time-series pack: trend (orders_ols_trend), level
    (events_ewma_smooth), seasonality (events_autocorrelation), and now
    level-SHIFT detection.

    Scale design: the fact table reduces to O(days) counts (the series
    grows with time, not volume); mean/σ are a broadcast 1-row frame;
    the running sum is a window over the tiny series, kept exact by
    summing grid integers (associative) rather than doubles (DuckDB
    segment-trees window sums — float association would differ).
    """
    from pyspark.sql import Window

    from argodb_mapreduce_spark.functions.oracle_safe import gsum

    g = float(1 << CUSUM_GRID_BITS)
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(F.count(F.lit(1)).alias("cnt"))
    m1 = daily.agg((F.sum("cnt").cast("double") / F.count(F.lit(1))).alias("xbar"))
    dev = F.col("cnt").cast("double") - F.col("xbar")
    m = (
        daily.crossJoin(F.broadcast(m1))
        .agg(
            F.any_value("xbar").alias("xbar"),
            F.sqrt(gsum(dev * dev, CUSUM_GRID_BITS) / F.count(F.lit(1))).alias("sigma"),
        )
    )
    w = Window.orderBy("day")
    gridded = daily.crossJoin(F.broadcast(m)).select(
        "day", "cnt",
        F.round((F.col("cnt").cast("double") - F.col("xbar")) * F.lit(g)).cast("long").alias("gdev"),
        "sigma",
    )
    cusum = (F.sum("gdev").over(w).cast("double") / F.lit(g))
    return gridded.select(
        F.col("day").cast("timestamp").alias("day"),
        "cnt",
        cusum.alias("cusum"),
        (F.abs(cusum) > F.lit(CUSUM_SIGMA_K) * F.col("sigma")).alias("flagged"),
    )


@register(
    "events_dau_wau_stickiness",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), days AS (
      SELECT DISTINCT day FROM ud
    ), contrib AS (
      SELECT user_id, day + CAST(i AS INT) AS end_day
      FROM ud, UNNEST(range(0, {ROLLING_DAYS})) AS u(i)
    ), wau AS (
      SELECT d.day, CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS wau
      FROM days d JOIN contrib c ON c.end_day = d.day
      GROUP BY d.day
    ), dau AS (
      SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
      FROM ud GROUP BY day
    )
    SELECT CAST(dau.day AS TIMESTAMP) AS day, dau.dau, wau.wau,
           CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
    FROM dau JOIN wau ON wau.day = dau.day
    """,
    tags=("analytics", "distinct", "engagement"),
    doc=(
        f"DAU/WAU stickiness: daily active users over the trailing "
        f"{ROLLING_DAYS}-day active users, per day — the engagement "
        "ratio product teams watch. Reuses the bounded-fan-out rolling "
        "distinct rewrite (shuffle O(user-days x 7), never O(events)); "
        "the ratio is one bigint/bigint IEEE division, engine-exact."
    ),
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engagement ratio beside events_rolling_distinct's raw count.

    Scale design: both numerator and denominator reduce the fact table
    to distinct (user, day) pairs first — one combiner-heavy shuffle —
    then DAU is a per-day distinct count and WAU the 7-day fan-out
    rewrite; the join keys on O(days) rows.
    """
    e = load_table(spark, sf_dir, "events")
    ud = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = ud.select("day").distinct()
    contrib = ud.select(
        "user_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(ROLLING_DAYS - 1)),
                lambda i: F.date_add(F.col("day"), i),
            )
        ).alias("end_day"),
    )
    wau = (
        days.join(contrib, days.day == contrib.end_day)
        .groupBy(days.day)
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    dau = ud.groupBy("day").agg(F.count_distinct("user_id").alias("dau"))
    return (
        dau.join(wau.withColumnRenamed("day", "wday"), F.col("wday") == F.col("day"))
        .select(
            F.col("day").cast("timestamp").alias("day"),
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
    )


@register(
    "events_activity_gini",
    oracle="""
    WITH per_user AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    ), ranked AS (
      SELECT n_events,
             ROW_NUMBER() OVER (ORDER BY n_events, user_id) AS rn,
             COUNT(*) OVER () AS n,
             SUM(n_events) OVER () AS total
      FROM per_user
    )
    SELECT CAST(ANY_VALUE(n) AS BIGINT) AS n_users,
           CAST(ANY_VALUE(total) AS BIGINT) AS n_events,
           CAST(CAST(2 * SUM(CAST(rn AS HUGEINT) * n_events) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(CAST(ANY_VALUE(n) AS HUGEINT) * ANY_VALUE(total) AS VARCHAR) AS DOUBLE)
             - CAST(ANY_VALUE(n) + 1 AS DOUBLE) / ANY_VALUE(n) AS gini
    FROM ranked
    """,
    tags=("analytics", "statistics", "concentration"),
    doc=(
        "Activity concentration as an exact Gini coefficient: per-user "
        "event counts ranked ascending (user_id tie-break), then "
        "G = 2·Σ(rank·x)/(n·Σx) − (n+1)/n — every sum is an exact "
        "integer, the two divisions are fixed-association IEEE ops, so "
        "the coefficient is bit-identical across engines. The "
        "one-number answer to 'how skewed is our traffic?' that sizes "
        "salting and skew-join decisions."
    ),
)
def events_activity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-concentration summary over the user dimension.

    Scale design (two-phase histogram rank, VERDICT r6 next-step 2):
    the fact table reduces to per-user counts (one combiner-heavy
    shuffle), then to a per-``n_events`` HISTOGRAM (a second combiner
    shuffle, output O(distinct counts) — thousands, not billions). The
    rank-weighted sum never materializes per-row ranks: within a tie
    group of count value x occupying ranks prev+1..cum, the
    user_id-tie-broken ROW_NUMBERs form an arithmetic series, so
    2*SUM(rn*x) == SUM over tie groups of x*(cum*(cum+1) -
    prev*(prev+1)) — triangular-number differences, exactly. The only
    total order left runs over the bounded histogram
    (``rank_histogram``), never the user dimension; no unpartitioned
    window receives more-than-histogram input.

    Every sum is an exact decimal(38,0) integer (rank*count products
    pass 2^63 long before 100 TB); the two final divisions are
    fixed-association IEEE ops, so the coefficient is bit-identical to
    the oracle's per-row ROW_NUMBER formulation at any parallelism.
    The oracle twin routes its HUGEINT sums through the VARCHAR hop
    because DuckDB's direct int128->double cast can double-round past
    2^53 while Spark's BigDecimal cast is correctly rounded.
    """
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    hist = rank_histogram(per_user, None, "n_events")
    x = F.col("n_events").cast("decimal(38,0)")
    cum = F.col("cum").cast("decimal(38,0)")
    prev = (F.col("cum") - F.col("cnt")).cast("decimal(38,0)")
    two_sum_rn_x = F.sum(x * (cum * (cum + F.lit(1)) - prev * (prev + F.lit(1))))
    n_users = F.any_value("n")
    total = F.sum(x * F.col("cnt").cast("decimal(38,0)"))
    return hist.agg(
        n_users.cast("bigint").alias("n_users"),
        total.cast("bigint").alias("n_events"),
        (
            two_sum_rn_x.cast("double")
            / (n_users.cast("decimal(38,0)") * total).cast("double")
            - (n_users + F.lit(1)).cast("double") / n_users
        ).alias("gini"),
    )
