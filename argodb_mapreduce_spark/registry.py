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
)

#: ROUND-3 DRIVER WINDOW (VERDICT r2 next-step 1). The driver checks the
#: first 50 entries of ``queries()`` in dict order; this explicit name
#: list pins those 50 slots to (a) the 4 round-1 red rows whose fixes are
#: in code but driver-unverified, then (b) every block that has never had
#: a driver row: the fn_* scalar pack (§2.D, 18), tpch_extra's 10 TPC-H
#: shapes, ingest (4, incl. dedup_incremental — VERDICT next-step 3),
#: training_data (5), stats (4), sampling (3), clustering (2). 4+18+10+4+
#: 5+4+3+2 = 50 exactly. Remaining registration order is unchanged, so
#: rounds 4+ can rotate profiling/analytics/curation/merge/joins_advanced
#: (~17 still unwitnessed) by editing only this tuple.
_PRIORITY = (
    # fixed-but-red in CORRECTNESS_r01
    "q12_shipmode_buckets",
    "scan_embeddings",
    "agg_listagg",
    "agg_approx_count_distinct",
    # fn_* scalar pack — the whole §2.D surface, zero driver rows so far
    "fn_string",
    "fn_regex",
    "fn_date",
    "fn_math",
    "fn_conditional",
    "fn_array",
    "fn_array_fold",
    "fn_map",
    "fn_json",
    "fn_cast_bridge",
    "fn_string_extended",
    "fn_datetime_extended",
    "fn_hash",
    "fn_bitwise",
    "fn_array_extended",
    "fn_struct",
    "fn_sample_selfcheck",
    "fn_null_semantics",
    # tpch_extra: the 10 TPC-H shapes added after round 1
    "q8_market_share",
    "q9_product_profit",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q18_large_orders",
    "q21_waiting_supplier",
    "q22_idle_customers",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q20_potential_promotion",
    # continuous-ingest pack (dedup_incremental = VERDICT next-step 3)
    "dedup_incremental",
    "dedup_survivor_quality",
    "vocab_coverage",
    "shuffle_shard_deterministic",
    # training-data prep
    "chunk_documents",
    "pack_sequences",
    "text_repetition_ratio",
    "decontam_ngram_overlap",
    "split_train_val_test",
    # stats / sampling / clustering
    "agg_stats_variance",
    "agg_median_manual",
    "agg_percentile_selfcheck",
    "agg_correlation",
    "sample_stratified",
    "sample_pergroup_topk",
    "data_mixture_sample",
    "kmeans_assign",
    "kmeans_lloyd_step",
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
