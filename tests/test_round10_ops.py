"""Round-10 op tests: CDF-driven index maintenance O(changes) proof."""

from __future__ import annotations

from pyspark.sql import functions as F

from argodb_mapreduce_spark.catalog import load_table


def test_cdf_index_maintenance_is_o_changes(spark, sf_dir):
    """The index's second commit contains EXACTLY the delta docs' band
    entries (footer metrics, no scan) — the corpus was never re-signed."""
    from argodb_mapreduce_spark.operators.dedup import (
        N_BANDS,
        SHINGLE_K,
        _build_cdf_index_fixture,
    )
    from argodb_mapreduce_spark.sources.versioned import _read_manifest

    docs_tbl, idx_tbl = _build_cdf_index_fixture(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n_delta_docs = docs.filter(
        (F.col("doc_id") % 5 == 0) & (F.size(F.split("text", " ")) >= SHINGLE_K)
    ).count()
    entries = _read_manifest(idx_tbl)
    assert len(entries) == 2
    assert entries[1]["metrics"]["num_rows"] == n_delta_docs * N_BANDS
    # and the base build covered only the other 80%
    n_base_docs = docs.filter(
        (F.col("doc_id") % 5 != 0) & (F.size(F.split("text", " ")) >= SHINGLE_K)
    ).count()
    assert entries[0]["metrics"]["num_rows"] == n_base_docs * N_BANDS
