"""Semantic properties of the round-5 operator additions, beyond the
hash-vs-oracle parity that tests/test_oracle_parity.py already runs:
sessionization gap invariants, SCD2 interval algebra, span-dedup
keep-first, PageRank mass conservation, co-occurrence bounds, and
normalized-embedding geometry."""

from __future__ import annotations

from pyspark.sql import functions as F

from argodb_mapreduce_spark.operators.sessions import (
    SESSION_GAP_MIN,
    events_sessionize,
    scd2_user_history,
)
from argodb_mapreduce_spark.operators.dedup import SPAN_TOKENS, dedup_span_exact
from argodb_mapreduce_spark.operators.graph import N_NATIONS, _TELEPORT, graph_pagerank
from argodb_mapreduce_spark.functions.text import text_cooccurrence_lift
from argodb_mapreduce_spark.operators.similarity import embedding_normalize_stats
from argodb_mapreduce_spark.catalog import load_table


def test_sessionize_gap_invariants(spark, sf_dir):
    sess = events_sessionize(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    # Every event lands in exactly one session.
    total = sess.agg(F.sum("n_events")).collect()[0][0]
    assert total == ev.count()
    # Consecutive sessions of the same user are separated by > GAP.
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("session_seq")
    bad = (
        sess.withColumn("prev_end", F.lag("session_end").over(w))
        .filter(
            F.col("prev_end").isNotNull()
            & (F.unix_micros("session_start") - F.unix_micros("prev_end") <= gap_us)
        )
        .count()
    )
    assert bad == 0
    # Within a session the span never implies an internal gap that
    # should have split it: start <= end always.
    assert sess.filter(F.col("session_start") > F.col("session_end")).count() == 0


def test_scd2_interval_algebra(spark, sf_dir):
    h = scd2_user_history(spark, sf_dir)
    # Exactly one current row per user.
    cur = h.filter("is_current").groupBy("user_id").count()
    assert cur.filter("count != 1").count() == 0
    # valid_to of version k equals valid_from of version k+1 (contiguous,
    # non-overlapping history).
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("version")
    bad = (
        h.withColumn("next_from", F.lead("valid_from").over(w))
        .filter(F.col("next_from").isNotNull() & (F.col("valid_to") != F.col("next_from")))
        .count()
    )
    assert bad == 0
    # No two consecutive versions carry the same attribute value
    # (SCD2 compresses runs).
    same = (
        h.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull() & (F.col("event_type") == F.col("next_type")))
        .count()
    )
    assert same == 0


def test_span_dedup_keep_first(spark, sf_dir):
    out = dedup_span_exact(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    # Every document appears; kept <= total spans.
    assert out.count() == docs.count()
    assert out.filter(F.col("n_kept") > F.col("n_spans")).count() == 0
    # Total kept spans == number of distinct span texts in the corpus.
    kept_total = out.agg(F.sum("n_kept")).collect()[0][0]
    distinct_spans = (
        docs.select(
            F.explode(
                F.expr(
                    f"transform(sequence(0, cast(ceil(size(split(text,' '))/{SPAN_TOKENS}.0) as int)-1),"
                    f" i -> concat_ws(' ', slice(split(text,' '), i*{SPAN_TOKENS}+1, {SPAN_TOKENS})))"
                )
            ).alias("s")
        )
        .distinct()
        .count()
    )
    assert kept_total == distinct_spans
    # The lowest doc_id containing a given span keeps it: doc 0's spans
    # are all kept if nothing earlier exists.
    first = out.orderBy("doc_id").first()
    assert first["n_kept"] >= 1


def test_pagerank_mass_and_bounds(spark, sf_dir):
    pr = graph_pagerank(spark, sf_dir)
    rows = pr.collect()
    assert len(rows) == N_NATIONS
    total = sum(r["pagerank"] for r in rows)
    # Stochastic matrix + teleport conserves probability mass.
    assert abs(total - 1.0) < 1e-9, total
    assert all(r["pagerank"] >= _TELEPORT - 1e-12 for r in rows)


def test_cooccurrence_bounds(spark, sf_dir):
    out = text_cooccurrence_lift(spark, sf_dir).collect()
    assert 0 < len(out) <= 20
    for r in out:
        assert r["c_ab"] <= min(r["df_a"], r["df_b"])
        assert r["lift"] > 0
        assert r["tok_a"] < r["tok_b"]


def test_embedding_normalization_geometry(spark, sf_dir):
    stats = embedding_normalize_stats(spark, sf_dir)
    rows = stats.collect()
    # One row per dimension, same vector count everywhere.
    counts = {r["n_vectors"] for r in rows}
    assert len(counts) == 1
    # Normalized components live in [-1, 1].
    for r in rows:
        assert -1.0 - 1e-9 <= r["min_comp"] <= r["max_comp"] <= 1.0 + 1e-9


def test_bigram_lm_score_bounds(spark, sf_dir):
    from argodb_mapreduce_spark.functions.text import text_bigram_lm_score

    out = text_bigram_lm_score(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    eligible = docs.filter(F.size(F.split("text", " ")) >= 2).count()
    assert out.count() == eligible
    # MLE conditional probabilities live in (0, 1].
    bad = out.filter((F.col("lm_score") <= 0) | (F.col("lm_score") > 1.0)).count()
    assert bad == 0


def test_null_safe_join_keeps_null_group(spark, sf_dir):
    from argodb_mapreduce_spark.operators.joins_advanced import join_null_safe

    out = join_null_safe(spark, sf_dir)
    rows = out.collect()
    null_rows = [r for r in rows if r["k"] is None]
    # The nulled 'error' category must survive the join...
    assert len(null_rows) == 1
    assert null_rows[0]["n_events"] > 0 and null_rows[0]["n_users"] > 0
    # ...whereas a plain equi-join on the same sides drops it.
    e = load_table(spark, sf_dir, "events")
    k = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("event_type"))
    left = e.groupBy(k.alias("k")).agg(F.count(F.lit(1)).alias("n_events"))
    right = e.groupBy(k.alias("k")).agg(F.countDistinct("user_id").alias("n_users"))
    plain = left.alias("l").join(right.alias("r"), F.col("l.k") == F.col("r.k"))
    assert plain.filter(F.col("l.k").isNull()).count() == 0
    assert plain.count() == len(rows) - 1
