"""Unit tests for the stdlib baseline-JPEG codec behind
multimodal_jpeg_decode.

The encoder must emit conformant ITU T.81 baseline sequential JFIF
(markers, Annex K Huffman tables, byte-stuffed scan) and the decoder
must be a *general* baseline grayscale reader: arbitrary conformant
quant/Huffman tables, proper DC-differential + run-length decode, and
fail-loud behavior on truncation, progressive/arithmetic markers, and
malformed streams — not just the inverse of our own writer.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from argodb_mapreduce_spark.operators.multimodal import _jpeg_codec

encode, parse = _jpeg_codec()


def _tiles(vals: np.ndarray, cols: int = 8) -> np.ndarray:
    """bytes -> constant-8x8-tile grayscale image (the op's test pattern)."""
    n = max(1, -(-len(vals) // cols)) * cols
    grid = np.zeros(n, dtype=np.uint8)
    grid[: len(vals)] = vals
    return np.repeat(np.repeat(grid.reshape(-1, cols), 8, axis=0), 8, axis=1)


def test_marker_layout_is_conformant():
    buf = encode(_tiles(np.arange(16, dtype=np.uint8)))
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    # required segments present, in order: APP0, DQT, SOF0, DHTx2, SOS
    for marker in (b"\xff\xe0", b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in buf, marker


def test_constant_tiles_roundtrip_exact_all_values():
    """Constant blocks + q=8 must be EXACT for every gray level —
    the property the oracle relies on."""
    vals = np.arange(256, dtype=np.uint8)
    img = _tiles(vals)
    (w, h, prec), px = parse(encode(img))
    assert (w, h, prec) == (64, 256, 8)
    assert np.array_equal(px, img)


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=1, max_size=64))
def test_arbitrary_byte_tiles_roundtrip_exact(raw):
    img = _tiles(np.frombuffer(raw, dtype=np.uint8))
    _, px = parse(encode(img))
    assert np.array_equal(px, img)


def test_nonconstant_image_is_lossy_but_bounded():
    """General content exercises the full AC path (runs, ZRL, EOB);
    with the flat q=8 table reconstruction error is small and bounded."""
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    (w, h, _), px = parse(encode(img))
    assert (w, h) == (64, 64)
    err = np.abs(px.astype(int) - img.astype(int)).max()
    assert 0 < err <= 16  # lossy, but bounded by the quant step

    smooth = (np.add.outer(np.arange(64), np.arange(64)) % 256).astype(np.uint8)
    _, px2 = parse(encode(smooth))
    assert np.abs(px2.astype(int) - smooth.astype(int)).max() <= 2


def test_non_multiple_of_8_dims_pad_by_edge_replication():
    img = np.full((10, 13), 77, dtype=np.uint8)
    (w, h, _), px = parse(encode(img))
    assert (w, h) == (13, 10)
    assert np.array_equal(px, img)


def test_decoder_accepts_foreign_quant_table():
    """The decoder must honor the DQT in the stream, not assume the
    encoder's: re-encode with a different flat table and check the
    constant-tile exactness argument still holds (q=4 divides 8c too)."""
    img = _tiles(np.array([0, 37, 128, 255], dtype=np.uint8))
    _, px = parse(encode(img, qval=4))
    assert np.array_equal(px, img)


def test_bad_signature_raises():
    with pytest.raises(ValueError, match="signature"):
        parse(b"\x89PNG\r\n\x1a\nnot-a-jpeg")


def test_truncated_segment_raises():
    buf = encode(_tiles(np.arange(8, dtype=np.uint8)))
    # cutting mid-header either slices a segment payload ("cut off") or
    # removes SOF/SOS entirely ("missing") — both must fail loud
    with pytest.raises(ValueError, match="truncated|cut off|missing"):
        parse(buf[:20])
    with pytest.raises(ValueError, match="truncated|cut off|missing"):
        parse(buf[:23])


def test_truncated_scan_raises():
    buf = encode(_tiles(np.arange(64, dtype=np.uint8)))
    # chop inside the entropy stream but keep an EOI so the failure is
    # the Huffman reader hitting the end, not the missing-EOI check
    with pytest.raises(ValueError, match="truncated|Huffman|EOI"):
        parse(buf[: len(buf) - len(buf) // 4])


def test_progressive_marker_raises():
    buf = bytearray(encode(_tiles(np.arange(8, dtype=np.uint8))))
    i = bytes(buf).index(b"\xff\xc0")
    buf[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="progressive|non-baseline"):
        parse(bytes(buf))


def test_byte_stuffing_roundtrips():
    """Content chosen to produce 0xFF bytes in the scan exercises the
    0xFF00 stuffing/unstuffing path; exactness proves it worked."""
    rng = np.random.default_rng(7)
    for _ in range(5):
        vals = rng.integers(0, 256, 48).astype(np.uint8)
        img = _tiles(vals)
        buf = encode(img)
        _, px = parse(buf)
        assert np.array_equal(px, img)


def test_spark_query_matches_oracle(spark):
    """End-to-end through the registered query at sf0.001."""
    import duckdb

    from argodb_mapreduce_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    q = all_queries()["multimodal_jpeg_decode"]
    df = q.fn(spark, sf)
    rows = {r["doc_id"]: r.asDict() for r in df.collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    od = con.execute(q.oracle).fetch_df()
    assert len(od) == len(rows)
    for i in range(len(od)):
        r = rows[od["doc_id"][i]]
        for c in ("width", "height", "n_px", "sum_px", "max_px"):
            assert r[c] == od[c][i], (c, r, od.iloc[i].to_dict())


# ---------------------------------------------------------------------------
# Restart markers (DRI/RSTn, round 9 — ADVICE r8)
# ---------------------------------------------------------------------------


def test_restart_interval_roundtrips_exact():
    """A DRI-encoded stream must decode to the SAME pixels as the
    marker-free encoding of the same image, across interval sizes that
    hit aligned, unaligned, and single-MCU restart boundaries."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(40, 64), dtype=np.uint8)  # 5x8 = 40 MCUs
    (_, _, _), ref = parse(encode(img))
    for ri in (1, 3, 8, 7, 40, 64):
        buf = encode(img, restart_interval=ri)
        assert b"\xff\xdd" in buf  # DRI segment present
        (w, h, prec), px = parse(buf)
        assert (w, h, prec) == (64, 40, 8)
        assert np.array_equal(px, ref), f"interval {ri}"


def test_restart_markers_cycle_d0_to_d7():
    img = np.zeros((8, 8 * 20), dtype=np.uint8)  # 20 MCUs, interval 2 -> 9 RSTs
    buf = encode(img, restart_interval=2)
    seen = []
    i = 0
    scan = buf[buf.find(b"\xff\xda") + 2 :]
    while i < len(scan) - 1:
        if scan[i] == 0xFF and 0xD0 <= scan[i + 1] <= 0xD7:
            seen.append(scan[i + 1] - 0xD0)
            i += 2
        else:
            i += 1
    assert seen == [i % 8 for i in range(9)]


def test_rst_without_dri_raises():
    img = np.zeros((8, 16), dtype=np.uint8)
    buf = bytearray(encode(img, restart_interval=1))
    dri = buf.find(b"\xff\xdd")
    del buf[dri : dri + 6]  # strip the DRI segment, keep the RSTs
    with pytest.raises(ValueError, match="no DRI"):
        parse(bytes(buf))


def test_rst_out_of_sequence_raises():
    img = np.zeros((8, 8 * 4), dtype=np.uint8)
    buf = bytearray(encode(img, restart_interval=1))
    scan = buf.find(b"\xff\xda")
    first_rst = buf.find(b"\xff\xd0", scan)
    assert first_rst > 0
    buf[first_rst + 1] = 0xD5  # corrupt the sequence number
    with pytest.raises(ValueError, match="out of sequence"):
        parse(bytes(buf))


def test_dc_predictor_resets_at_restart():
    """A gradient image makes DC prediction matter: if the decoder did
    NOT reset the predictor at each RST, every segment after the first
    would decode shifted. Interval 1 maximizes resets."""
    img = np.repeat(np.arange(16, dtype=np.uint8)[None, :] * 16, 8, axis=0)
    img = np.repeat(img, 8, axis=1)[:8, : 8 * 16]
    _, ref = parse(encode(img))
    _, px = parse(encode(img, restart_interval=1))
    assert np.array_equal(px, ref)
