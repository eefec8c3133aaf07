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

#: ROUND-5 DRIVER WINDOW (VERDICT r4 next-step 1). The driver checks the
#: first 50 entries of ``queries()`` in dict order; this list pins those
#: slots to (a) the 6 queries with no driver row ever — the five added
#: after the r4 window froze plus round 5's new DPP query — reaching
#: 174/174 ever-witnessed, then (b) the 7 queries whose code changed in
#: round 5 (versioned-writer commit protocol + ns-cast, LSH blocked
#: bucket scorer + CC consumer, shingle df cap, winnowing poly-hash
#: mapInPandas kernel) so their banked rows are re-earned against the
#: new code, then (c) the 5 partition/range sink round-trips whose
#: staged layouts are governed by the round-5 fixture_stale boundary
#: fix, then (c2) the nine operators added late in round 5
#: (sessionize, SCD2, span dedup, PageRank, co-occurrence, embedding
#: normalize, bloom join, bigram LM score, null-safe join) and (c3)
#: the thirteen closing-round-5 operators (Markov transitions,
#: triangle count, fuzzy Levenshtein join, TV divergence, weighted
#: Bernoulli sample, basket pair lift, exact EWMA, OLS trend,
#: migration fingerprint, LATERAL top-k, recursive-CTE ancestors, ABC
#: Pareto classes, last-touch attribution, snapshot diff, PCA top
#: component) — first-ever driver evidence, then (c4) the five
#: operators added after the first r5 freeze (data-quality constraint
#: audit, daily-series autocorrelation, Welch A/B t-statistic, cohort
#: LTV triangle, RAKE keywords, PQ encode, PQ ADC search, stacked
#: IVF-PQ) — the (c4) block fills the window.
#: 6+7+5+9+15+8 = 50 exactly.
#:
#: ROUND-6 ROTATION NOTE: thirty-four r1-banked rows did not fit this
#: window and are the oldest evidence after r5 — ``q7_nation_volume``,
#: ``q13_order_distribution``, ``window_range_frame``, ``events_funnel``,
#: ``q14_promo_share``, ``q17_small_quantity``, ``q19_disjunctive``,
#: ``window_rank_extended``, ``agg_boolean``, ``unpivot_melt``, plus the
#: twenty-four displaced by the late-round-5 additions: ``q4_order_priority``,
#: ``q6_revenue_forecast``, ``q10_top_returners``, ``subquery_in``,
#: ``subquery_above_avg``, ``distinct_pairs``, ``set_except``,
#: ``set_union_all``, ``set_intersect``, ``sort_limit``, ``window_rank``,
#: ``window_lag_lead``, ``window_moving_sum``, ``topk_per_group``,
#: ``q3_top_unshipped``, ``q5_local_supplier_volume``, ``join_cross``,
#: ``join_anti``, ``join_left_outer``, ``join_full_outer``,
#: ``agg_pivot``, ``join_inner``, ``agg_grouping_sets``, ``agg_cube``,
#: the eight r1 refreshers displaced by the (c4) additions
#: (``agg_having``, ``agg_rollup``, ``scan_partition_nomatch``,
#: ``scan_events``, ``agg_minmax_distinct``, ``scan_projection``,
#: ``scan_partition_filter``, ``scan_lineitem`` — the last refreshed
#: in r3), and the
#: round-5 cleaning pack (``events_anomaly_mad``, ``clean_winsorize``)
#: and BI pack (``agg_mode``, ``window_percent_of_total``,
#: ``orders_rfm_segments``) and the live session-window stream
#: (``stream_session_live``) and the 3-branch CDC merge
#: (``sink_merge_with_deletes``) and the RESTORE rollback
#: (``snapshot_rollback``) and the time-bounded funnel
#: (``events_funnel_windowed``) and the streaming quality gate
#: (``stream_quality_gate_live``) and the CUSUM level-shift detector
#: (``events_cusum_changepoint``) and the interval pair
#: (``orders_open_backlog``, ``join_temporal_scd2``) and the final pair
#: (``scan_schema_evolution``, ``orders_seasonality_dow``,
#: ``events_dau_wau_stickiness``, ``orders_interarrival_stats``,
#: ``events_activity_gini``) — registered after the window froze,
#: strict-sim verified locally at sf0.01. ALSO lead r6 with
#: ``dedup_minhash_clusters`` and ``dedup_minhash_survivors``: their
#: r4-banked rows pre-date the late-r5 connected-components rework
#: (edge-touched-vertex iteration + pointer jumping; the shared path's
#: new-code evidence in r5 is ``similarity_embedding_clusters`` plus
#: local parity). Lead the r6 window with all of the above
#: (plus anything r6 adds or touches), then refresh the oldest r2 rows
#: (dedup_exact_rows, simhash, cosine/neardup, text pack, multimodal,
#: udf pack).
_PRIORITY = (
    # --- (a) never driver-witnessed: closes the book at 174/174 ---
    "agg_salted_skew",
    "stream_sliding_live",
    "sink_zorder_roundtrip",
    "join_asof_tolerance",
    "agg_grouping_flags",
    "scan_partition_dynamic",
    # --- (b) code changed in round 5: re-earn the green row ---
    "pyds_versioned_scan",
    "pyds_versioned_write",
    "similarity_lsh_neardup",
    "similarity_embedding_clusters",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "text_fingerprint_winnow",
    # --- (c) staged-layout sinks governed by the fixture_stale fix ---
    "sink_partitioned_roundtrip",
    "sink_partition_scan_null",
    "sink_partitioned_multilevel",
    "sink_range_roundtrip",
    "sink_range_pruned_lookup",
    # --- (c2) late round-5 additions: first-ever driver evidence ---
    "events_sessionize",
    "scd2_user_history",
    "dedup_span_exact",
    "graph_pagerank",
    "text_cooccurrence_lift",
    "embedding_normalize_stats",
    "join_bloom_pruned",
    "text_bigram_lm_score",
    "join_null_safe",
    # --- (c3) final round-5 additions: first-ever driver evidence ---
    "events_markov_transition",
    "graph_triangle_count",
    "dedup_fuzzy_levenshtein",
    "corpus_tv_divergence",
    "sample_weighted_bernoulli",
    "basket_pair_lift",
    "events_ewma_smooth",
    "orders_ols_trend",
    "table_migration_fingerprint",
    "join_lateral_topk",
    "recursive_cte_ancestors",
    "parts_abc_classification",
    "events_attribution_last_touch",
    "snapshot_diff",
    "embedding_pca_top_component",
    # --- (c4) post-freeze round-5 additions: first-ever driver evidence ---
    "dq_constraint_audit",
    "events_autocorrelation",
    "events_ab_welch_t",
    "orders_cohort_ltv",
    "text_keyword_rake",
    "similarity_pq_encode",
    "similarity_pq_adc_topk",
    "similarity_ivfpq_topk",
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
