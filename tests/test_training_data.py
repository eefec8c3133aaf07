"""Conservation invariants for the training-data prep operators —
properties that must hold for ANY corpus, checked on the fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from argodb_mapreduce_spark.catalog import load_table
from argodb_mapreduce_spark.operators.training_data import (
    CHUNK_TOKENS,
    PACK_BUDGET,
    chunk_documents,
    pack_sequences,
)


def _total_tokens(spark, sf_dir) -> int:
    d = load_table(spark, sf_dir, "documents")
    return d.select(F.sum(F.size(F.split("text", " ")))).collect()[0][0]


def test_chunking_conserves_tokens(spark, sf_dir):
    chunks = chunk_documents(spark, sf_dir)
    assert chunks.agg(F.sum("n_chunk_tokens")).collect()[0][0] == _total_tokens(spark, sf_dir)
    # Every chunk except a doc's last is exactly CHUNK_TOKENS wide.
    w_max = chunks.groupBy("doc_id").agg(F.max("chunk_idx").alias("last_idx"))
    bad = (
        chunks.join(w_max, "doc_id")
        .filter((F.col("chunk_idx") < F.col("last_idx")) & (F.col("n_chunk_tokens") != CHUNK_TOKENS))
        .count()
    )
    assert bad == 0


def test_packing_conserves_tokens_and_bins_are_contiguous(spark, sf_dir):
    bins = pack_sequences(spark, sf_dir)
    assert bins.agg(F.sum("total_tokens")).collect()[0][0] == _total_tokens(spark, sf_dir)
    # Bin ids per source are 0..max with no gaps (concat-and-chunk layout
    # leaves no empty bins), and doc ranges of consecutive bins don't
    # interleave: bin N's last doc <= bin N+1's first doc.
    rows = bins.orderBy("source", "bin_id").collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, bs in by_source.items():
        assert [b["bin_id"] for b in bs] == list(range(len(bs))), source
        for prev, nxt in zip(bs, bs[1:]):
            assert prev["last_doc"] <= nxt["first_doc"], source
    # A bin never holds more than budget-worth of doc *starts* plus the
    # one doc that may straddle its end.
    for source, bs in by_source.items():
        for b in bs[:-1]:
            assert b["total_tokens"] >= 1
