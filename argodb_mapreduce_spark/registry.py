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
)

#: ROUND-4 DRIVER WINDOW (VERDICT r3 next-step 1). The driver checks the
#: first 50 entries of ``queries()`` in dict order; this list pins those
#: slots to (a) the 16 queries that had never had a driver row entering
#: round 4 — after this window every pre-round-4 query is
#: driver-witnessed — then (b) the queries whose code changed this round
#: (top-k rewrite, persist removal, oracle TRY_CAST fix, LSH in-bucket
#: verify, CC refactor) so their banked green rows are re-earned against
#: the new code, then (c) the 6 operators ADDED in round 4 (containment,
#: BM25, count-min, quantile rollup, embedding clusters, versioned
#: writer) for first-time evidence, then (d) banked rows not re-run
#: since their first green
#: round (joins, minhash pipeline, streaming, IVF, snapshot) as a
#: regression re-confirmation. 16+5+6+23 = 50 exactly.
#:
#: ROUND-5 ROTATION NOTE: five operators were added AFTER this window
#: froze and need first-time driver evidence next round —
#: ``agg_salted_skew``, ``stream_sliding_live``, ``sink_zorder_roundtrip``,
#: ``join_asof_tolerance``, ``agg_grouping_flags``. Swap them in for five
#: banked re-confirmations (any stream_*/join_* rows below whose code r4
#: leaves green).
_PRIORITY = (
    # --- never driver-witnessed (closes the evidence book: 162/162) ---
    "snapshot_compaction",
    "pyds_versioned_scan",
    "curation_pipeline",
    "sink_merge_upsert",
    "join_salted_skew",
    "join_range_bands",
    "window_time_range_frame",
    "events_rolling_distinct",
    "events_retention",
    "events_gapfill",
    "events_anomaly_zscore",
    "sketch_rollup_hll",
    "profile_orders",
    "profile_length_histogram",
    "profile_token_spectrum",
    "profile_join_skew",
    # --- code changed in round 4: re-earn the green row ---
    "dedup_minhash_verified",
    "dedup_ngram_jaccard",
    "text_top_tokens",
    "data_mixture_sample",
    "text_fingerprint_winnow",
    # --- NEW in round 4: first-time driver evidence ---
    "dedup_containment",
    "text_bm25_topk",
    "sketch_count_min",
    "sketch_rollup_quantile",
    "similarity_embedding_clusters",
    "pyds_versioned_write",
    # --- banked, or touched indirectly this round (streaming source
    # bridge, versioned fixture staleness, CC refactor): re-confirm ---
    "q1_pricing_summary",
    "join_semi",
    "join_broadcast_dim",
    "join_asof",
    "dedup_exact",
    "dedup_minhash_signature",
    "dedup_minhash_pairs",
    "dedup_minhash_clusters",
    "dedup_minhash_survivors",
    "dedup_simhash_pairs",
    "dedup_incremental",
    "stream_window_tumbling",
    "stream_window_sliding",
    "stream_session_window",
    "stream_tumbling_live",
    "stream_dedup_watermark",
    "stream_stateful_counts",
    "stream_join_live",
    "stream_merge_upsert_live",
    "similarity_ivf_topk",
    "similarity_ivf_recall",
    "similarity_lsh_neardup",
    "snapshot_time_travel",
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
