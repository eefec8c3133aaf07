"""Query registry: the single source of truth for ``__spark_entry__``.

Every implemented operator from SURVEY.md §2 registers here with a
(spark, sf_dir) -> DataFrame callable and, where ANSI-SQL-expressible,
a DuckDB oracle SQL twin. The driver's correctness harness runs both
sides at sf=0.01 and hash-compares; tests/test_oracle_parity.py runs
the same comparison locally at sf=0.001.

Conventions (see functions/oracle_safe.py for why):
* every computed column is aliased identically on both sides;
* double aggregates go through exact-decimal summation;
* LIMIT/top-k queries carry a total order (unique-key tie-break);
* queries never collect to the driver.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: Modules that contribute registered queries, imported lazily in this
#: order. ORDER IS THE DRIVER'S CORRECTNESS WINDOW: the driver checks the
#: first N registration-order entries, so modules whose queries have no
#: driver-green row yet register first (round 2: the entire LLM-pipeline
#: pack — dedup/similarity/text/multimodal/streaming/udfs/sinks/stats —
#: ahead of relational/scans, whose green rows are banked in
#: CORRECTNESS_r01.json; VERDICT r1 next-step 1).
_QUERY_MODULES = (
    "argodb_mapreduce_spark.operators.relational",
    "argodb_mapreduce_spark.operators.scans",
    "argodb_mapreduce_spark.operators.dedup",
    "argodb_mapreduce_spark.operators.similarity",
    "argodb_mapreduce_spark.functions.text",
    "argodb_mapreduce_spark.operators.multimodal",
    "argodb_mapreduce_spark.streaming.windows",
    "argodb_mapreduce_spark.functions.udfs",
    "argodb_mapreduce_spark.sources.hive_partitions",
    "argodb_mapreduce_spark.sources.range_partitions",
    "argodb_mapreduce_spark.sources.versioned",
    "argodb_mapreduce_spark.sources.python_datasource",
    "argodb_mapreduce_spark.operators.sampling",
    "argodb_mapreduce_spark.operators.ingest",
    "argodb_mapreduce_spark.operators.curation",
    "argodb_mapreduce_spark.operators.merge",
    "argodb_mapreduce_spark.functions.stats",
    "argodb_mapreduce_spark.operators.training_data",
    "argodb_mapreduce_spark.operators.clustering",
    "argodb_mapreduce_spark.operators.analytics",
    "argodb_mapreduce_spark.operators.profiling",
    "argodb_mapreduce_spark.operators.tpch_extra",
    "argodb_mapreduce_spark.functions.scalar",
    "argodb_mapreduce_spark.operators.joins_advanced",
    "argodb_mapreduce_spark.operators.retrieval",
    "argodb_mapreduce_spark.operators.sketches",
    "argodb_mapreduce_spark.operators.zorder",
    "argodb_mapreduce_spark.operators.sessions",
    "argodb_mapreduce_spark.operators.graph",
    "argodb_mapreduce_spark.operators.cleaning",
    "argodb_mapreduce_spark.operators.bi",
    "argodb_mapreduce_spark.operators.modern_sql",
)

#: ROUND-6 DRIVER WINDOW (VERDICT r5 next-step 1). The driver checks the
#: first 50 entries of ``queries()`` in dict order; this list pins those
#: slots to (a) the eighteen queries registered after the r5 window froze
#: and therefore never driver-witnessed (the cleaning pack, BI pack,
#: live session/quality-gate streams, MERGE deletes, RESTORE, temporal
#: SCD2, schema evolution, windowed funnel, backlog, CUSUM, DOW
#: seasonality, stickiness, interarrival, Gini) — green rows here reach
#: 224/224 ever-witnessed for the r5 registry; then (b) the seven
#: queries whose code changed in late r5 / r6 and must re-earn their
#: banked rows: ``dedup_minhash_clusters``/``dedup_minhash_survivors``
#: (connected-components rework: edge-touched iteration + pointer
#: jumping), ``similarity_lsh_neardup``/``similarity_embedding_clusters``
#: (min-band pair emission, int32 transfer), ``agg_median_manual``
#: (two-phase histogram rank), ``events_ab_welch_t``/``orders_ols_trend``
#: (NULLIF degenerate-input guards). Note ``orders_interarrival_stats``,
#: ``events_activity_gini``, ``events_anomaly_mad`` and
#: ``clean_winsorize`` also changed in r6 (histogram rank / exact-sum
#: hardening) but already sit in block (a). Then (c) any operators
#: round 6 adds, and (d) refreshers: the ten r1-banked rows that have
#: never been re-checked since round 1, then the oldest r2-banked
#: dedup/similarity/text/multimodal/udf rows.
#:
_PRIORITY = (
    # --- (a) registered after the r5 window froze: never driver-witnessed ---
    "sink_merge_with_deletes",
    "snapshot_rollback",
    "events_funnel_windowed",
    "stream_quality_gate_live",
    "events_cusum_changepoint",
    "orders_open_backlog",
    "join_temporal_scd2",
    "scan_schema_evolution",
    "orders_seasonality_dow",
    "events_dau_wau_stickiness",
    "orders_interarrival_stats",
    "events_activity_gini",
    "stream_session_live",
    "events_anomaly_mad",
    "clean_winsorize",
    "agg_mode",
    "window_percent_of_total",
    "orders_rfm_segments",
    # --- (b) code changed late-r5/r6: re-earn the banked rows ---
    "dedup_minhash_clusters",
    "dedup_minhash_survivors",
    "similarity_lsh_neardup",
    "similarity_embedding_clusters",
    "agg_median_manual",
    "events_ab_welch_t",
    "orders_ols_trend",
    # --- (c) new round-6 operators: first-ever driver evidence ---
    # (inserted as round 6 adds them)
    # --- (d) refreshers: r1 rows never re-checked since round 1 ---
    "q7_nation_volume",
    "q13_order_distribution",
    "window_range_frame",
    "events_funnel",
    "q14_promo_share",
    "q17_small_quantity",
    "q19_disjunctive",
    "window_rank_extended",
    "agg_boolean",
    "unpivot_melt",
    # --- (d cont.) oldest r2-banked rows ---
    "dedup_exact_rows",
    "dedup_simhash",
    "similarity_cosine_topk",
    "similarity_embedding_neardup",
    "text_langid",
    "text_quality_score",
    "text_token_stats",
    "multimodal_byte_features",
    "multimodal_frame_sample",
    "multimodal_ingest",
    "udf_pandas_scalar",
    "udf_apply_in_pandas",
    "udf_pandas_grouped_agg",
    "udf_python_rowwise",
    "text_pii_scrub",
)


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, Query] = {}
_loaded = False
#: Module → traceback string for modules that failed to import; queries
#: from healthy modules stay available (tests assert this dict is empty).
_IMPORT_ERRORS: dict[str, str] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator: add a (spark, sf_dir) -> DataFrame query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load() -> None:
    global _loaded
    if _loaded:
        return
    import sys
    import traceback

    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except Exception:  # noqa: BLE001 - one broken module must not hide the rest
            _IMPORT_ERRORS[mod] = traceback.format_exc()
            print(f"registry: failed to import {mod}:\n{_IMPORT_ERRORS[mod]}", file=sys.stderr)
    _loaded = True


def import_errors() -> dict[str, str]:
    """Modules that failed to import during registry load (empty = healthy)."""
    _load()
    return dict(_IMPORT_ERRORS)


def all_queries() -> dict[str, Query]:
    """Registry ordered with the current driver window (_PRIORITY) first.

    Dict order IS the driver's correctness window: the harness checks the
    first N entries, so _PRIORITY names lead and everything else follows
    in registration order.
    """
    _load()
    ordered = {name: _REGISTRY[name] for name in _PRIORITY if name in _REGISTRY}
    ordered.update((name, q) for name, q in _REGISTRY.items() if name not in ordered)
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
