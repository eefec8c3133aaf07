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
