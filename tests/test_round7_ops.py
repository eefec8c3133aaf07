"""Invariant tests for the round-7 operator additions (beyond oracle
parity): SQ8 quantization bounds, keyframe energy bounds, SemDeDup
keeper-rule properties, BPE pair-statistic shape.
"""

from __future__ import annotations

from argodb_mapreduce_spark import registry

QS = registry.all_queries()


def test_sq8_code_range_and_error_bound(spark, sf_dir):
    """Codes must stay in [-127, 127]; rounding guarantees the
    reconstruction error is at most half a quantization step."""
    rows = QS["embedding_int8_quantize"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -127 <= r["qmin"] <= r["qmax"] <= 127
        if r["scale"] > 0:
            assert r["max_abs_err"] <= r["scale"] / 2 * (1 + 1e-9), r
        else:
            assert r["max_abs_err"] == 0.0


def test_keyframe_energy_bounds(spark, sf_dir):
    """Inter-frame energy is bounded by 255 per byte position; frame 0
    has no predecessor so frame_no starts at 1."""
    from argodb_mapreduce_spark.operators.multimodal import FRAME_BYTES

    rows = QS["multimodal_keyframe_detect"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["frame_no"]
        assert 0 <= r["energy"] <= 255 * FRAME_BYTES
        assert r["is_keyframe"] == (r["energy"] >= 32 * FRAME_BYTES)


def test_semdedup_keeper_rule(spark, sf_dir):
    """Every dropped vector's keeper has a strictly lower id, lives in
    the same cluster (by construction), and a vector is never dropped
    twice (one output row per dropped vec)."""
    rows = QS["dedup_semantic_clusters"].fn(spark, sf_dir).collect()
    seen = set()
    for r in rows:
        assert r["kept_by"] < r["vec_id"]
        assert r["n_similar"] >= 1
        assert r["vec_id"] not in seen
        seen.add(r["vec_id"])


def test_bpe_pairs_are_single_symbols(spark, sf_dir):
    rows = QS["bpe_pair_stats"].fn(spark, sf_dir).collect()
    assert rows
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert len(r["a"]) == 1 and len(r["b"]) == 1
        assert r["pair_count"] >= 1


def test_cdc_duplicate_docs_share_all_chunks(spark, tmp_path_factory):
    """Two identical documents must contribute identical chunk sets, so
    every chunk of the pair appears with n_occ >= 2 — CDC's core
    guarantee that identical content dedups regardless of its position
    in the corpus."""
    import os

    d = str(tmp_path_factory.mktemp("cdc_pair"))
    text = "the quick brown fox jumps over the lazy dog " * 20
    df = spark.createDataFrame(
        [(0, "s", "en", text, len(text)), (1, "s", "en", text, len(text))],
        "doc_id long, source string, lang string, text string, n_chars int",
    )
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    rows = QS["dedup_cdc_chunks"].fn(spark, d).collect()
    assert rows, "identical docs must produce duplicated chunks"
    for r in rows:
        assert r["n_occ"] % 2 == 0 and r["n_docs"] == 2, r
