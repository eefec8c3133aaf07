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

#: ROUND-7 DRIVER WINDOW (VERDICT r6 next-step 6). The driver checks the
#: first 50 entries of ``queries()`` in dict order; all 224 queries have
#: a driver-witnessed green row (union of CORRECTNESS_r01-r06 ==
#: registry), so the r7 window is (a) queries whose CODE CHANGED in
#: round 7 and must re-earn their banked rows — the two retired
#: scale warts (``events_activity_gini`` on the two-phase histogram
#: rank, ``orders_rfm_segments`` on distributed
#: global_row_number + integer NTILE), extended as r7 touches more
#: code — then (b) the staleness rotation: the 32 rows whose only
#: green evidence is round 1 and the 8 whose newest is round 2
#: (code unchanged since, but six rounds of fixture regeneration is
#: a long bank). Post-r7 the staleness histogram should have no r01
#: entries.
_PRIORITY = (
    # --- (a) code changed in round 7: re-earn the rows ---
    "events_activity_gini",
    "orders_rfm_segments",
    "similarity_lsh_neardup",
    "similarity_embedding_clusters",
    "parts_abc_classification",
    # --- (a cont.) new round-7 operators: first driver evidence ---
    "multimodal_audio_decode",
    "multimodal_image_decode",
    "multimodal_image_histogram",
    "multimodal_byte_thumbnail",
    "multimodal_keyframe_detect",
    "text_boilerplate_phrases",
    "text_boilerplate_coverage",
    "bpe_pair_stats",
    "dedup_cdc_chunks",
    "dedup_cdc_incremental",
    "dedup_semantic_clusters",
    "embedding_int8_quantize",
    # --- (b) staleness rotation: last-green r01 (32 rows) ---
    "scan_lineitem",
    "scan_projection",
    "scan_partition_filter",
    "scan_partition_nomatch",
    "scan_events",
    "agg_minmax_distinct",
    "agg_having",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_pivot",
    "join_inner",
    "join_left_outer",
    "join_full_outer",
    "join_anti",
    "join_cross",
    "q3_top_unshipped",
    "q5_local_supplier_volume",
    "sort_limit",
    "window_rank",
    "window_lag_lead",
    "window_moving_sum",
    "topk_per_group",
    "set_union_all",
    "set_intersect",
    "set_except",
    "distinct_pairs",
    "subquery_above_avg",
    "subquery_in",
    "q4_order_priority",
    "q6_revenue_forecast",
    "q10_top_returners",
    # --- (b cont.) last-green r02 (8 rows) ---
    "embedding_centroid_per_label",
    "text_tfidf_top_terms",
    # text_sentiment_lexicon, text_rarity_score, udtf_tokenize +
    # source_csv/json/orc_roundtrip (r02-banked) deferred to the r8
    # rotation: the new PNG/BPE/CDC/SemDeDup/SQ8/keyframe ops take
    # their window slots; the 50-entry window must keep every
    # r01-banked row inside it (VERDICT r6 next-step 6 done-bar).
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
