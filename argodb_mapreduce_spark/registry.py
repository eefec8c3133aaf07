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

#: ROUND-11 DRIVER WINDOW. The driver checks the first 50 entries of
#: ``queries()`` in dict order. Standing policy (see COVERAGE.md): the
#: window leads with (a) queries whose code CHANGED or is NEW this
#: round — they must (re-)earn their green rows — then (b) at least 20
#: slots of staleness rotation, oldest banked evidence first. After r10
#: the staleness floor was r04: exactly 15 rows (measured from the
#: CORRECTNESS union; the r10 verdict corrected COVERAGE.md's
#: miscounted 13). ALL 15 rotate in below, then the 10
#: alphabetically-first r05-tier rows fill the window (8 new + 17
#: changed + 15 + 10 = 50, measured against the CORRECTNESS union),
#: leaving a post-r11 floor of r05 (31 rows: embedding_pca_top_
#: component, events_attribution_last_touch, events_autocorrelation
#: onward lead the r12 rotation). tests/test_round8_ops.py asserts
#: len(_PRIORITY) == 50 so a silent 51st entry can never fall out of
#: the window again (ADVICE r7).
_PRIORITY = (
    # --- (a) new in round 11: first driver evidence ---
    "snapshot_change_feed_updates",     # CDF through UPDATE/MERGE (sidecars)
    "mv_refresh_through_update",        # MV maintenance through update legs
    "stream_backlog_drain",             # bounded-run streaming admission
    "stream_change_feed_updates_live",  # streaming CDF over cdc sidecars
    "pyds_rowgroup_pruned_scan",        # within-file row-group skipping
    "snapshot_partition_evolution",     # per-segment partition specs
    "sink_optimized_write",             # write-time small-files fix
    "dedup_index_through_updates",      # LSH index maintained via MERGE
    "stream_cdc_replicate",             # full CDC replication loop
    "snapshot_generated_column",        # GENERATED ALWAYS AS columns
    "snapshot_delete_keys",             # set-based DV delete (GDPR shape)
    "dedup_index_through_deletes",      # GDPR cascade into the index
    "pipeline_medallion",               # bronze->silver->gold composition
    "snapshot_gdpr_purge",              # physical erasure, raw-bytes audit
    "snapshot_describe_detail",         # one-row metadata summary
    "snapshot_restore_to_timestamp",    # RESTORE resolves AS OF rule
    "snapshot_vacuum_retention",        # VACUUM RETAIN n HOURS
    "sink_identity_column",             # GENERATED ALWAYS AS IDENTITY
    "pyds_partitioned_scan",            # partition-aware Python DataSource
    "snapshot_change_feed_partitioned", # CDF delete recovery, Hive layout
    "snapshot_quarantine_replay",       # exactly-once repair-and-reingest
    "similarity_filtered_topk",         # filtered ANN, strategy by stats
    "snapshot_update_on_dv",            # DML composes with deletion vectors
    "pyds_partitioned_write",           # Hive-layout writes via the pyds sink
    "stream_expect_quarantine_live",    # streaming DLT loop incl. replay
    "mv_refresh_through_delete",        # MV maintenance through DV deletes
    # --- (a cont.) code changed in round 11: re-earn the rows ---
    "snapshot_change_feed",       # delete leg -> layout-aware file scan
    "snapshot_vacuum",            # lock scope + retain_hours + cdc GC
    # (snapshot_rollback ceded its changed-code slot to the new
    # index-through-updates row: the fenced lock it re-earned is the
    # shared commit machinery every versioned row in this window
    # drives, and rollback semantics are pinned in tests.)
    "snapshot_expect_quarantine", # violation tagging factored out
    # (join_salted_targeted ceded its changed-code slot to the new
    # identity-column row: the positional-union fix is pinned by
    # tests/test_round10_ops.py and its driver row was green in the
    # r10 window.)
    # (pyds_versioned_scan ceded its changed-code slot to the new CDC
    # replication row: the reader paths it re-earned are driven by
    # pyds_partitioned_scan and pyds_rowgroup_pruned_scan, both in this
    # window.)
    # (pyds_versioned_write ceded its changed-code slot to the new
    # generated-columns row: the writer path it re-earned is driven by
    # pyds_partitioned_write, in this window.)
    # (pyds_pruned_scan ceded its changed-code slot to the new purge
    # row: source pruning is driven by pyds_rowgroup_pruned_scan and
    # pyds_partitioned_scan, both in this window.)
    # (stream_versioned_ingest ceded its changed-code slot to the new
    # index-through-deletes row: the stream reader's partition plumbing
    # is driven by stream_backlog_drain and the CDF stream rows, all in
    # this window.)
    # (stream_change_feed_live ceded its changed-code slot to the new
    # medallion row: its _emit reorder is driven by
    # stream_change_feed_updates_live, in this window.)
    # (stream_versioned_sink ceded its changed-code slot to the new
    # delete_keys row: its versioned_write_txn machinery is driven by
    # stream_expect_quarantine_live's per-leg txn stamps, in this
    # window.)
    "snapshot_partitioned_scan",  # native read casts ledger types
    # (snapshot_zorder_scan ceded its changed-code slot to the new
    # partition-evolution row: its r11 change — staged-dir cleanup on
    # failure — is error-path-only and pinned by tests/test_zorder.py,
    # while a NEW op needs first driver evidence.)
    # (snapshot_delete_where ceded its changed-code slot to the new
    # optimized-write row: its r11 change is the shared cast-aware DV
    # machinery that snapshot_update_on_dv — in the window — exercises
    # on the same code path.)
    # (snapshot_update_where ceded its changed-code slot to the new
    # restore-to-timestamp row: its r11b changes — zero-match no-op and
    # sidecar read-back — are driven by snapshot_change_feed_updates and
    # mv_refresh_through_update, in this window.)
    # (snapshot_merge_pruned ceded its changed-code slot to the new
    # vacuum-retention row: the MERGE sidecar read-back is driven by
    # snapshot_change_feed_updates and stream_cdc_replicate, in this
    # window.)
    # (snapshot_compact_binpack ceded its changed-code slot to the new
    # describe-detail row: DV materialization in rewrites is driven by
    # snapshot_update_on_dv and snapshot_gdpr_purge, in this window.)
    # --- (b) staleness rotation: ALL 15 rows whose newest evidence is
    # r04 (VERDICT r10 #5, verified against the CORRECTNESS union) ---
    "sink_merge_upsert",
    "sketch_count_min",
    "sketch_rollup_hll",
    "sketch_rollup_quantile",
    "stream_dedup_watermark",
    "stream_join_live",
    "stream_merge_upsert_live",
    "stream_session_window",
    "stream_stateful_counts",
    "stream_tumbling_live",
    "stream_window_sliding",
    "stream_window_tumbling",
    "text_bm25_topk",
    "text_top_tokens",
    "window_time_range_frame",
    # --- (b cont.) the 5 alphabetically-first r05-tier rows (five
    # slots ceded to the r11b additions: the CDF-through-DML pair, the
    # backlog drain, the live CDF-updates stream, and the row-group
    # skip scan; 20 rotation slots remain, at the >=20 policy floor) ---
    "agg_grouping_flags",
    "agg_salted_skew",
    "basket_pair_lift",
    "corpus_tv_divergence",
    "dedup_containment",
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
