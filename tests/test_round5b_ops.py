"""Semantic properties of the post-freeze round-5 additions, beyond
oracle parity: constraint-audit verdicts, ACF bounds, Welch symmetry,
LTV monotonicity, RAKE stopword handling, and the pointer-jumping CC
round bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from argodb_mapreduce_spark.operators.analytics import (
    ACF_MAX_LAG,
    events_ab_welch_t,
    events_autocorrelation,
)
from argodb_mapreduce_spark.operators.bi import orders_cohort_ltv
from argodb_mapreduce_spark.operators.dedup import min_label_components
from argodb_mapreduce_spark.operators.profiling import dq_constraint_audit
from argodb_mapreduce_spark.functions.text import text_keyword_rake


def test_constraint_audit_verdicts(spark, sf_dir):
    rows = {r["constraint_name"]: r for r in dq_constraint_audit(spark, sf_dir).collect()}
    assert len(rows) == 7
    # Verdict flag is derived, never contradicts the violation count.
    for r in rows.values():
        assert r["passed"] == (r["violations"] == 0)
        assert 0 <= r["violations"] <= r["checked_rows"]
    # The two business rules genuinely fail on the fixture; the
    # structural rules (uniqueness, RI, completeness, domain) hold.
    assert not rows["lineitem.l_discount:max(0.05)"]["passed"]
    assert rows["lineitem.l_orderkey:fk(orders.o_orderkey)"]["passed"]
    assert rows["customer.c_nationkey:fk(nation.n_nationkey)"]["passed"]
    assert rows["events.event_id:unique"]["passed"]
    assert rows["lineitem.l_quantity:not_null"]["passed"]
    assert rows["orders.o_orderstatus:in(F,O,P)"]["passed"]


def test_autocorrelation_bounds(spark, sf_dir):
    rows = events_autocorrelation(spark, sf_dir).collect()
    assert sorted(r["lag"] for r in rows) == list(range(1, ACF_MAX_LAG + 1))
    n_days = rows[0]["n_pairs"] + rows[0]["lag"]
    for r in rows:
        # |ACF| <= 1 up to the estimator's missing-tail slack; pair
        # counts shrink by exactly one day per lag on a gapless series.
        assert abs(r["acf"]) <= 1.0 + 1e-9
        assert r["n_pairs"] == n_days - r["lag"]


def test_welch_t_symmetry_and_frame(spark, sf_dir):
    row = events_ab_welch_t(spark, sf_dir).collect()[0]
    assert row["n_a"] > 0 and row["n_b"] > 0
    assert row["var_a"] > 0 and row["var_b"] > 0
    # df lies in the Welch bounds: min(n-1) <= df <= n_a + n_b - 2.
    assert min(row["n_a"], row["n_b"]) - 1 <= row["df"] <= row["n_a"] + row["n_b"] - 2
    # t has the sign of the mean difference.
    import math

    assert math.copysign(1.0, row["t_stat"]) == math.copysign(
        1.0, row["mean_a"] - row["mean_b"]
    )


def test_cohort_ltv_cumulative_monotone(spark, sf_dir):
    df = orders_cohort_ltv(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("cohort_month").orderBy("age_months")
    bad = (
        df.withColumn("prev", F.lag("cum_ltv").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("cum_ltv") < F.col("prev")))
        .count()
    )
    assert bad == 0  # revenue is positive, so LTV never decreases
    # age 0 exists for every cohort (the first order defines the cohort).
    n_cohorts = df.select("cohort_month").distinct().count()
    assert df.filter(F.col("age_months") == 0).count() == n_cohorts


def test_rake_consecutive_stopwords_not_masked(spark, sf_dir):
    # The \b-based delimiter must break "fast a a slow" into two
    # phrases; a space-delimited pattern would consume the shared space
    # and leave "a slow" as a phrase containing a stopword.
    rows = text_keyword_rake(spark, sf_dir).collect()
    assert len(rows) == 20
    from argodb_mapreduce_spark.functions.text import _STOPWORDS

    for r in rows:
        assert r["n_words"] == len(r["phrase"].split(" "))
        assert not set(r["phrase"].split(" ")) & set(_STOPWORDS), r["phrase"]
        assert r["rake_score"] > 0


def test_cc_pointer_jumping_round_bound(spark):
    # A 30-chain has diameter 29: plain min-label propagation needs 29
    # rounds, pointer jumping must land well under the 8-round cap.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(29)], "a_id long, b_id long"
    )
    verts = spark.range(33).select(F.col("id"))
    out = {
        r["id"]: r["cluster_id"]
        for r in min_label_components(verts, pairs, caller="t", max_rounds=8).collect()
    }
    assert all(out[i] == 0 for i in range(30))
    assert all(out[i] == i for i in range(30, 33))  # singletons self-label


def test_cc_converges_exactly_not_early(spark):
    # Two components + an isolated vertex: labels are component minima.
    pairs = spark.createDataFrame(
        [(5, 9), (9, 7), (20, 21)], "a_id long, b_id long"
    )
    verts = spark.createDataFrame([(i,) for i in (5, 7, 9, 20, 21, 99)], "id long")
    out = {
        r["id"]: r["cluster_id"]
        for r in min_label_components(verts, pairs, caller="t").collect()
    }
    assert out == {5: 5, 7: 5, 9: 5, 20: 20, 21: 20, 99: 99}


def test_pq_encode_shape_and_code_domain(spark, sf_dir):
    from argodb_mapreduce_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        similarity_pq_encode,
    )
    from argodb_mapreduce_spark.catalog import load_table

    codes = similarity_pq_encode(spark, sf_dir)
    n_vec = load_table(spark, sf_dir, "embeddings").count()
    # Exactly PQ_M codes per vector, all codes in [0, PQ_K).
    assert codes.count() == n_vec * PQ_M
    assert codes.filter((F.col("code") < 0) | (F.col("code") >= PQ_K)).count() == 0
    assert codes.filter(F.col("dist_sq") < 0).count() == 0
    # A codebook seed reconstructs itself exactly in every subspace.
    seed_ids = [r["vec_id"] for r in codes.select("vec_id").distinct().orderBy("vec_id").limit(1).collect()]
    assert codes.filter(F.col("vec_id") == seed_ids[0]).filter(F.col("dist_sq") != 0).count() == 0


def test_pq_adc_topk_is_bounded_and_ordered(spark, sf_dir):
    from argodb_mapreduce_spark.operators.similarity import (
        PQ_QUERIES,
        PQ_TOPK,
        similarity_pq_adc_topk,
    )

    top = similarity_pq_adc_topk(spark, sf_dir).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r["query_id"], []).append(r)
        assert r["vec_id"] != r["query_id"]
        assert r["adc_dist"] >= 0
    assert len(by_q) == PQ_QUERIES
    assert all(len(v) == PQ_TOPK for v in by_q.values())


def test_ivfpq_results_come_from_probed_lists(spark, sf_dir):
    from argodb_mapreduce_spark.operators.similarity import (
        PQ_QUERIES,
        PQ_TOPK,
        similarity_ivfpq_topk,
    )

    top = similarity_ivfpq_topk(spark, sf_dir).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r["query_id"], []).append(r["adc_dist"])
        assert r["vec_id"] != r["query_id"]
        assert r["adc_dist"] >= 0
    assert len(by_q) == PQ_QUERIES
    # Probing IVFPQ_PROBES of 16 lists still yields a full top-k on the
    # fixture (candidate pool >> k), and results are rank-ordered.
    for dists in by_q.values():
        assert len(dists) == PQ_TOPK
        assert dists == sorted(dists)


def test_open_backlog_invariants(spark, sf_dir):
    """Backlog is a running count of live intervals: never negative,
    drains to zero once every order has fully shipped, and the deltas
    conserve (sum of net == final n_open)."""
    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.operators.bi import orders_open_backlog

    rows = sorted(orders_open_backlog(spark, sf_dir).collect(), key=lambda r: r["day"])
    assert all(r["n_open"] >= 0 for r in rows)
    # Orders with no lineitem rows never close: the backlog drains to
    # exactly that count, not to zero.
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("o_orderkey"))
    lineless = o.join(li, "o_orderkey", "left_anti").count()
    assert rows[-1]["n_open"] == lineless
    assert sum(r["net"] for r in rows) == rows[-1]["n_open"]
    running = 0
    for r in rows[:200]:
        running += r["net"]
        assert r["n_open"] == running


def test_temporal_scd2_exactly_one_state_per_purchase(spark, sf_dir):
    """SCD2 intervals partition each user's timeline, so every purchase
    matches exactly one state row and the state is the purchase's own
    run (the SCD2 attribute at purchase time is 'purchase')."""
    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.operators.sessions import join_temporal_scd2

    enriched = join_temporal_scd2(spark, sf_dir)
    n_purchases = (
        load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase").count()
    )
    assert enriched.count() == n_purchases
    assert enriched.select("event_id").distinct().count() == n_purchases
    # A purchase event starts-or-extends a 'purchase' run in the change
    # feed, so its valid state must carry that attribute value.
    assert enriched.filter(F.col("state_type") != "purchase").count() == 0
