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
    "argodb_mapreduce_spark.operators.materialized_view",
)

#: ROUND-13 DRIVER WINDOW. The driver checks the first 50 entries of
#: ``queries()`` in dict order. Standing policy (see COVERAGE.md): the
#: window leads with (a) queries whose code CHANGED or is NEW this
#: round — they must (re-)earn their green rows — then (b) staleness
#: rotation, oldest banked evidence first. Round 13 taught the change
#: feed (batch + streaming) to synthesize legs across RESTORE/overwrite,
#: distributed delete_keys' over-cap pruning, gave the pyds writer the
#: columnMapping feature, reworked stream_cdc_replicate (presence pass,
#: dels-first replay, mid-history RESTORE), and touched delete_where/
#: compact per ADVICE — hence 19 changed-code slots; the rotation takes
#: ALL 13 remaining r05-tier rows (VERDICT r12 #2: every row's freshest
#: driver evidence becomes >= r06) plus the 10 alphabetically-first r06
#: rows. tests/test_round8_ops.py asserts len(_PRIORITY) == 50 so a
#: silent 51st entry can never fall out of the window again (ADVICE r7).
_PRIORITY = (
    # --- (a) new in round 13: first driver evidence ---
    "snapshot_change_feed_through_restore",      # batch CDF across RESTORE
    "stream_change_feed_through_restore_live",   # streaming twin
    "snapshot_delete_keys_bigset",               # over-cap distributed prune
    "pyds_write_after_rename",                   # writer columnMapping
    "pyds_encrypted_roundtrip",                  # parquet modular encryption
    "stream_encrypted_tail_live",                # keyed stream over encrypted
    "mv_refresh_through_restore",                # MV maintained through RESTORE
    "dedup_index_through_restore",               # index healed through RESTORE
    # --- (a cont.) code changed in round 13: re-earn the rows ---
    "stream_cdc_replicate",           # presence pass + dels-first + RESTORE
    "snapshot_change_feed",           # synthesis branch in change_feed
    "snapshot_change_feed_partitioned",
    "snapshot_change_feed_between_ts",
    "snapshot_change_feed_updates",
    "stream_change_feed_live",        # streaming partitions() restructure
    "stream_change_feed_updates_live",
    "stream_change_feed_through_optimize",
    "stream_versioned_ingest",
    "stream_backlog_drain",
    "snapshot_delete_keys",           # prune_cap parameter
    "snapshot_delete_keys_pruned",    # range-quarter fixture (was ntile)
    "snapshot_delete_where",          # absolute-root DV drop counting
    "snapshot_retention_delete",
    "snapshot_compaction",            # repartition fallback under want
    "snapshot_gdpr_purge",
    "pyds_versioned_write",           # writer mapping plumbing
    "pyds_partitioned_write",
    "snapshot_column_mapping",
    # --- (b) staleness rotation: ALL 13 remaining r05-tier rows ---
    "similarity_pq_adc_topk",
    "similarity_pq_encode",
    "sink_partition_scan_null",
    "sink_partitioned_multilevel",
    "sink_partitioned_roundtrip",
    "sink_range_pruned_lookup",
    "sink_range_roundtrip",
    "stream_sliding_live",
    "table_migration_fingerprint",
    "text_bigram_lm_score",
    "text_cooccurrence_lift",
    "text_fingerprint_winnow",
    "text_keyword_rake",
    # --- (b cont.) the 10 alphabetically-first r06-tier rows ---
    "agg_boolean",
    "agg_median_manual",
    "agg_mode",
    "clean_winsorize",
    "dedup_exact_rows",
    "dedup_minhash_clusters",
    "dedup_minhash_survivors",
    "dedup_simhash",
    "events_ab_welch_t",
    "events_anomaly_mad",
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
