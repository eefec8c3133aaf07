"""Degenerate-input robustness: empty text, single-token docs, one-doc
corpora. A 100 TB crawl always contains these; operators must neither
crash nor emit wrong-shaped output. (Oracle parity at the normal
fixtures is covered by test_oracle_parity; these are the shapes the
synthetic fixtures never produce.)
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from argodb_mapreduce_spark import registry

#: Deliberately hostile corpus: empty text, whitespace-only, one token,
#: exactly SHINGLE_K tokens, a normal doc, and an exact duplicate of it.
_DOCS = [
    (0, "srcA", "en", ""),
    (1, "srcA", "en", " "),
    (2, "srcB", "en", "solitary"),
    (3, "srcB", "en", "three token document"),
    (4, "srcC", "en", "a perfectly ordinary document with enough tokens to shingle"),
    (5, "srcC", "en", "a perfectly ordinary document with enough tokens to shingle"),
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("edge_docs"))
    df = spark.createDataFrame(
        [(i, s, lang, t, len(t)) for i, s, lang, t in _DOCS],
        "doc_id long, source string, lang string, text string, n_chars int",
    )
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


QS = registry.all_queries()


@pytest.mark.parametrize(
    "name",
    [
        "dedup_exact",
        "dedup_minhash_signature",
        "dedup_minhash_pairs",
        "dedup_ngram_jaccard",
        "dedup_containment",
        "text_fingerprint_winnow",
        "text_top_tokens",
        "sketch_count_min",
        "text_bm25_topk",
        "chunk_documents",
    ],
)
def test_no_crash_on_degenerate_docs(spark, edge_dir, name):
    rows = QS[name].fn(spark, edge_dir).collect()
    assert isinstance(rows, list)  # completed without raising


def test_exact_dedup_finds_the_duplicate(spark, edge_dir):
    rows = {r["content_hash"]: r for r in QS["dedup_exact"].fn(spark, edge_dir).collect()}
    assert sum(r["n_copies"] for r in rows.values()) == len(_DOCS)
    dup = [r for r in rows.values() if r["n_copies"] == 2]
    assert len(dup) == 1 and dup[0]["keep_doc_id"] == 4


def test_minhash_pairs_only_the_true_duplicate(spark, edge_dir):
    pairs = QS["dedup_minhash_pairs"].fn(spark, edge_dir).collect()
    assert {(p["a_id"], p["b_id"]) for p in pairs} == {(4, 5)}


def test_containment_scores_duplicate_fully(spark, edge_dir):
    rows = QS["dedup_containment"].fn(spark, edge_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["a_id"], r["b_id"]) == (4, 5)
    assert r["c_ab"] == 1.0 and r["c_ba"] == 1.0


def test_winnow_skips_too_short_docs(spark, edge_dir):
    fp = QS["text_fingerprint_winnow"].fn(spark, edge_dir)
    doc_ids = {r["doc_id"] for r in fp.select("doc_id").distinct().collect()}
    # Docs shorter than the k-gram width (k=8 chars) produce no
    # fingerprints; everything long enough fingerprints identically for
    # the duplicate pair.
    assert 0 not in doc_ids and 1 not in doc_ids
    by_doc = {
        r["doc_id"]: r["fps"]
        for r in fp.groupBy("doc_id").agg(F.sort_array(F.collect_list("fingerprint")).alias("fps")).collect()
    }
    assert by_doc[4] == by_doc[5]


def test_cms_never_underestimates_on_edge_corpus(spark, edge_dir):
    rows = QS["sketch_count_min"].fn(spark, edge_dir).collect()
    assert rows and all(r["never_underestimates"] for r in rows)
    assert all(r["n_cms"] >= r["n_exact"] for r in rows)


def test_bm25_ranks_the_duplicates_identically(spark, edge_dir):
    rows = QS["text_bm25_topk"].fn(spark, edge_dir).collect()
    scores = {r["doc_id"]: r["bm25"] for r in rows}
    # Identical docs must score identically; token-free docs (empty /
    # whitespace-only) contribute no terms and never appear — the empty
    # string must NOT act as a matchable high-df term.
    assert scores[4] == scores[5]
    assert 0 not in scores and 1 not in scores


@pytest.mark.parametrize(
    "name",
    ["dedup_span_exact", "text_cooccurrence_lift", "text_bigram_lm_score"],
)
def test_round5_text_ops_survive_degenerate_docs(spark, edge_dir, name):
    rows = QS[name].fn(spark, edge_dir).collect()
    assert isinstance(rows, list)


def test_span_dedup_collapses_exact_duplicate(spark, edge_dir):
    """Doc 5 duplicates doc 4 exactly: every one of its spans is a
    repeat, so span dedup keeps zero spans for it and its dedup_text is
    empty, while doc 4 (first occurrence) keeps everything."""
    out = {r["doc_id"]: r for r in QS["dedup_span_exact"].fn(spark, edge_dir).collect()}
    assert out[5]["n_kept"] == 0 and out[5]["dedup_text"] == ""
    assert out[4]["n_kept"] == out[4]["n_spans"]


def test_bigram_lm_skips_short_docs(spark, edge_dir):
    """Docs with fewer than 2 tokens (empty / whitespace / solitary)
    produce no bigrams and are absent from the score table."""
    ids = {r["doc_id"] for r in QS["text_bigram_lm_score"].fn(spark, edge_dir).collect()}
    assert 0 not in ids and 2 not in ids
    assert {3, 4, 5} <= ids


# ---------------------------------------------------------------------------
# Closing round-5 ops: Markov / EWMA / fuzzy join / TV divergence.
# ---------------------------------------------------------------------------

#: u1: a single event (no transition, EWMA = its own value).
#: u2: constant value series (EWMA must equal the constant everywhere).
#: u3: alternating types/values (a real chain).
_EVENTS = [
    (1, "2024-01-01 00:00:00", 1, "view", 5.0),
    (10, "2024-01-01 00:00:00", 2, "view", 3.0),
    (11, "2024-01-01 00:01:00", 2, "click", 3.0),
    (12, "2024-01-01 00:02:00", 2, "view", 3.0),
    (13, "2024-01-01 00:03:00", 2, "click", 3.0),
    (20, "2024-01-01 00:00:00", 3, "view", 1.0),
    (21, "2024-01-01 00:01:00", 3, "purchase", 9.0),
    (22, "2024-01-01 00:02:00", 3, "view", 5.0),
]


@pytest.fixture(scope="module")
def edge_events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("edge_events"))
    df = spark.createDataFrame(
        [(e, ts, u, t, v, "{}") for e, ts, u, t, v in _EVENTS],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return d


def test_markov_rows_normalize_and_skip_lone_users(spark, edge_events_dir):
    """u1's solitary event contributes no transition; each src row's
    probabilities sum to exactly 1 (the counts are small integers whose
    ratio sum is exact)."""
    rows = QS["events_markov_transition"].fn(spark, edge_events_dir).collect()
    pairs = {(r["src"], r["dst"]): r for r in rows}
    # u2: view->click x2, click->view x1; u3: view->purchase, purchase->view
    assert pairs[("view", "click")]["n"] == 2
    assert pairs[("view", "purchase")]["n"] == 1
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src"], 0.0)
        by_src[r["src"]] += r["prob"]
    for src, total in by_src.items():
        assert abs(total - 1.0) < 1e-12, (src, total)


def test_ewma_constant_series_and_lone_event(spark, edge_events_dir):
    """A constant series must smooth to the constant (renormalization
    correctness), and a single-event user's EWMA is its own value."""
    rows = {(r["user_id"], r["event_id"]): r["ewma"]
            for r in QS["events_ewma_smooth"].fn(spark, edge_events_dir).collect()}
    assert rows[(1, 1)] == 5.0
    for eid in (10, 11, 12, 13):
        assert rows[(2, eid)] == 3.0, (eid, rows[(2, eid)])


def test_ewma_stays_inside_value_envelope(spark, sf_dir):
    """EWMA is a convex combination of observed values, so it can never
    leave the [min, max] envelope of its user's series."""
    df = QS["events_ewma_smooth"].fn(spark, sf_dir)
    env = df.groupBy("user_id").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    bad = (
        df.join(env, "user_id")
        .filter((F.col("ewma") < F.col("lo") - 1e-9) | (F.col("ewma") > F.col("hi") + 1e-9))
        .count()
    )
    assert bad == 0


def test_fuzzy_levenshtein_finds_exact_duplicate_pair(spark, edge_dir):
    """The duplicate docs (4, 5) share lang and length band and have
    distance 0; every emitted pair respects doc_a < doc_b and the
    threshold."""
    from argodb_mapreduce_spark.operators.dedup import LEV_MAX_DIST

    rows = QS["dedup_fuzzy_levenshtein"].fn(spark, edge_dir).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["edit_distance"] for r in rows}
    assert pairs[(4, 5)] == 0
    assert all(a < b for a, b in pairs)
    assert all(d <= LEV_MAX_DIST for d in pairs.values())


def test_tv_divergence_unit_interval(spark, sf_dir):
    rows = QS["corpus_tv_divergence"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["tv_distance"] <= 1.0, r


def test_tv_divergence_zero_for_identical_slices(spark, tmp_path_factory):
    """A language slice with exactly the en token distribution must
    measure TV = 0 (the drift monitor's no-drift fixed point)."""
    d = str(tmp_path_factory.mktemp("tv_docs"))
    docs = [
        (0, "s", "en", "alpha beta beta"),
        (1, "s", "xx", "alpha beta beta"),
        (2, "s", "yy", "gamma gamma gamma"),
    ]
    df = spark.createDataFrame(
        [(i, s, lang, t, len(t)) for i, s, lang, t in docs],
        "doc_id long, source string, lang string, text string, n_chars int",
    )
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    rows = {r["lang"]: r["tv_distance"] for r in QS["corpus_tv_divergence"].fn(spark, d).collect()}
    assert rows["xx"] == 0.0
    assert rows["yy"] == 1.0  # disjoint vocabulary = maximal drift


def test_rake_on_degenerate_docs(spark, edge_dir):
    """Empty / whitespace / all-stopword docs contribute no phrases and
    must not crash or emit empty-phrase rows."""
    rows = QS["text_keyword_rake"].fn(spark, edge_dir).collect()
    assert all(r["phrase"].strip() != "" for r in rows)
    assert all(r["rake_score"] > 0 for r in rows)


@pytest.fixture(scope="module")
def edge_ab_events_dir(spark, tmp_path_factory):
    """Hostile events: a single user, a single day, one variant side
    nearly empty — the shapes that break ACF/Welch denominators."""
    import datetime

    d = str(tmp_path_factory.mktemp("edge_events"))
    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        # user 0 (variant A): three events, one day
        (0, base, 0, "view", 1.0, "{}"),
        (1, base + datetime.timedelta(minutes=1), 0, "click", 2.0, "{}"),
        (2, base + datetime.timedelta(minutes=2), 0, "purchase", 3.0, "{}"),
        # user 1 (variant B): two events so var_b is defined
        (3, base + datetime.timedelta(minutes=3), 1, "view", 4.0, "{}"),
        (4, base + datetime.timedelta(minutes=4), 1, "view", 5.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return d


def test_acf_single_day_series_yields_no_pairs(spark, edge_ab_events_dir):
    """A one-day series has no lag pairs: the ACF frame must be empty
    (never a division error on the zero denominator)."""
    rows = QS["events_autocorrelation"].fn(spark, edge_ab_events_dir).collect()
    assert rows == []


def test_welch_minimal_variants(spark, edge_ab_events_dir):
    """Two rows per variant is the minimum for a defined variance; the
    statistic must come back finite."""
    import math

    row = QS["events_ab_welch_t"].fn(spark, edge_ab_events_dir).collect()[0]
    assert row["n_a"] == 3 and row["n_b"] == 2
    assert math.isfinite(row["t_stat"]) and math.isfinite(row["df"])


def test_windowed_funnel_single_user_path(spark, edge_ab_events_dir):
    """User 0 completes view→click→purchase within minutes; user 1
    never clicks: stage counts must be exactly [2, 1, 1]."""
    rows = {r["step"]: r["n_users"] for r in QS["events_funnel_windowed"].fn(spark, edge_ab_events_dir).collect()}
    assert rows == {1: 2, 2: 1, 3: 1}


def test_bpe_pair_stats_on_degenerate_docs(spark, edge_dir):
    """Empty / whitespace-only / single-char-token docs contribute no
    pairs but must not crash; the duplicated doc 4/5 doubles its pair
    weights. Hand-check one pair: 'do' occurs in 'document' (docs 3,4,5)
    and 'ordinary' contains 'di' not 'do' — count 'do' occurrences."""
    rows = QS["bpe_pair_stats"].fn(spark, edge_dir).collect()
    counts = {(r["a"], r["b"]): r["pair_count"] for r in rows}
    assert all(c >= 1 for c in counts.values())
    # 'do' appears once per 'document' token: docs 3, 4, 5 -> weight 3
    if ("d", "o") in counts:
        assert counts[("d", "o")] == 3
    # top-20 ordering is (count desc, a, b) deterministic
    vals = [r["pair_count"] for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_bpe_pair_stats_single_char_corpus(spark, tmp_path_factory):
    """A corpus of only 1-char tokens has no adjacent pairs at all: the
    operator must return an empty frame, not raise on the transform
    over sequence(1, 0)."""
    import os

    d = str(tmp_path_factory.mktemp("bpe_single"))
    df = spark.createDataFrame(
        [(0, "s", "en", "a b c a b", 9)],
        "doc_id long, source string, lang string, text string, n_chars int",
    )
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    assert QS["bpe_pair_stats"].fn(spark, d).collect() == []


def test_cdc_chunks_on_degenerate_docs(spark, edge_dir):
    """Docs shorter than the hash window become a single whole-doc
    chunk; empty docs are excluded; the duplicated doc pair 4/5 must
    produce at least one chunk with n_occ >= 2."""
    rows = QS["dedup_cdc_chunks"].fn(spark, edge_dir).collect()
    assert all(r["n_occ"] > 1 for r in rows)
    assert any(r["n_docs"] >= 2 for r in rows)


def test_cdc_chunks_reassemble_documents(spark, sf_dir):
    """Segmentation must be a partition of each document: per-doc chunk
    lengths sum to the doc length (no gaps, overlaps, or dropped
    tails)."""
    from pyspark.sql import functions as F2

    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.operators.dedup import CDC_D, CDC_K, _cdc_codes_hash

    d = load_table(spark, sf_dir, "documents").filter(F2.length("text") >= 1)
    h = _cdc_codes_hash("i")  # the production boundary rule
    seg = d.select(
        "doc_id",
        F2.length("text").alias("doc_len"),
        F2.expr("transform(split(text, ''), c -> ascii(c))").alias("codes"),
    ).select(
        "doc_id",
        "doc_len",
        F2.expr(
            f"concat(array(1), "
            f"  filter(if(size(codes) >= {CDC_K + 1}, sequence(2, size(codes) - {CDC_K} + 1), array()), "
            f"         i -> {h} % {CDC_D} = 0), "
            f"  array(size(codes) + 1))"
        ).alias("cuts"),
    )
    # Assert driver-side: filtering ON the cuts column would push the
    # predicate through the projection and re-substitute the whole codes
    # construction per reference (measured 20x slower than computing
    # cuts once) — a fine plan property to know, a bad one for a test.
    for row in seg.collect():
        cuts = row["cuts"]
        assert cuts[-1] - 1 == row["doc_len"], row
        assert all(a < b for a, b in zip(cuts, cuts[1:])), row
