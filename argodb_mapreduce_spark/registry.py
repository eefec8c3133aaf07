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
    "argodb_mapreduce_spark.operators.cbo",
)

#: ROUND-8 DRIVER WINDOW. The driver checks the first 50 entries of
#: ``queries()`` in dict order. Standing policy (see COVERAGE.md): the
#: window leads with (a) queries whose code CHANGED or is NEW this
#: round — they must (re-)earn their green rows — then (b) the rows
#: with the OLDEST banked evidence. After r7 the staleness floor was
#: r02 (7 rows); those rotate in now, plus the 28 alphabetically-first
#: of the 45 unchanged rows whose newest evidence is r03 (the other 17
#: — q12_shipmode_buckets q15_top_supplier q16_supplier_cnt q18_large_orders
#: q20_potential_promotion q21_waiting_supplier q22_idle_customers
#: q2_min_cost_supplier q8_market_share q9_product_profit
#: sample_pergroup_topk sample_stratified scan_embeddings
#: shuffle_shard_deterministic split_train_val_test
#: text_repetition_ratio vocab_coverage — lead the r9 rotation).
#: tests/test_round8_ops.py asserts len(_PRIORITY) == 50 so a silent
#: 51st entry can never fall out of the window again (ADVICE r7).
_PRIORITY = (
    # --- (a) new in round 8: first driver evidence ---
    "stream_stateful_custom",
    "similarity_ivfpq_refined",
    "multimodal_jpeg_decode",
    "fn_variant_extract",
    "pipe_syntax_priority_summary",
    "bpe_train_merges",
    "dedup_minhash_incremental",
    "similarity_index_build",
    "similarity_index_search",
    # --- (a cont.) code changed in round 8: re-earn the rows ---
    "dedup_semantic_clusters",   # tau/k params + assign_blocked
    "kmeans_assign",             # assign_blocked
    "kmeans_lloyd_step",         # assign_blocked
    "similarity_ivfpq_topk",     # refactored onto _ivfpq_pipeline
    "multimodal_image_decode",   # shared _png_reader
    "multimodal_image_histogram",  # shared _png_reader + div binning
    # --- (b) staleness rotation: newest evidence r02 (all 7) ---
    "source_csv_roundtrip",
    "source_json_roundtrip",
    "source_orc_roundtrip",
    "text_rarity_score",
    "text_sentiment_lexicon",
    "text_tfidf_top_terms",
    "udtf_tokenize",
    # --- (b cont.) newest evidence r03 (34 of 45) ---
    "agg_approx_count_distinct",
    "agg_correlation",
    "agg_listagg",
    "agg_percentile_selfcheck",
    "agg_stats_variance",
    "chunk_documents",
    "decontam_ngram_overlap",
    "dedup_survivor_quality",
    "fn_array",
    "fn_array_extended",
    "fn_array_fold",
    "fn_bitwise",
    "fn_cast_bridge",
    "fn_conditional",
    "fn_date",
    "fn_datetime_extended",
    "fn_hash",
    "fn_json",
    "fn_map",
    "fn_math",
    "fn_null_semantics",
    "fn_regex",
    "fn_sample_selfcheck",
    "fn_string",
    "fn_string_extended",
    "fn_struct",
    "pack_sequences",
    "q11_important_stock",
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
