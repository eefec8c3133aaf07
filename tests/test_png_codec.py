"""Unit tests for the stdlib PNG codec behind multimodal_image_decode.

The encode stage must produce spec-conformant PNG containers (signature,
CRC-32 chunks, filtered+deflated scanlines) and the decode stage must be
a *general* grayscale-8 reader: all five filter types, CRC verification,
multi-IDAT concatenation — not just the inverse of our own writer.
"""

from __future__ import annotations

import struct
import zlib

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from argodb_mapreduce_spark.operators.multimodal import (
    PNG_WIDTH,
    _png_decode_batches,
    _png_encode_batches,
)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _decode_one(png: bytes) -> dict:
    (out,) = list(_png_decode_batches()([pd.DataFrame({"doc_id": [1], "png": [png]})]))
    return out.iloc[0].to_dict()


def _encode_one(raw: bytes) -> bytes:
    (out,) = list(
        _png_encode_batches(PNG_WIDTH)([pd.DataFrame({"doc_id": [1], "content": [raw]})])
    )
    return out["png"][0]


@pytest.mark.parametrize("n", [0, 1, PNG_WIDTH - 1, PNG_WIDTH, PNG_WIDTH + 1, 10 * PNG_WIDTH])
def test_roundtrip_stats_match_source_bytes(n):
    raw = bytes((7 * i + 13) % 256 for i in range(n))
    row = _decode_one(_encode_one(raw))
    h = max(1, -(-n // PNG_WIDTH))
    assert row["width"] == PNG_WIDTH
    assert row["height"] == h
    assert row["bit_depth"] == 8 and row["color_type"] == 0
    assert row["n_px"] == PNG_WIDTH * h
    assert row["sum_px"] == sum(raw)  # zero padding adds no mass
    assert row["max_px"] == (max(raw) if raw else 0)
    assert row["mean_px"] == sum(raw) / (PNG_WIDTH * h)


def _png_with_filters(pixels: list[list[int]], filters: list[int]) -> bytes:
    """Hand-build a PNG using an INDEPENDENT filter implementation."""
    w = len(pixels[0])
    raw = bytearray()
    for r, (row, ft) in enumerate(zip(pixels, filters)):
        above = pixels[r - 1] if r else [0] * w
        raw.append(ft)
        for i, x in enumerate(row):
            a = row[i - 1] if i else 0
            b = above[i]
            c = pixels[r - 1][i - 1] if (r and i) else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            raw.append((x - pred) & 0xFF)
    ihdr = struct.pack(">IIBBBBB", w, len(pixels), 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def test_decoder_handles_all_five_filter_types():
    # 5 rows, one per filter type, values chosen to wrap mod 256
    pixels = [
        [250, 3, 17, 255],
        [1, 254, 9, 128],
        [200, 200, 0, 64],
        [5, 251, 130, 130],
        [77, 0, 255, 1],
    ]
    png = _png_with_filters(pixels, [0, 1, 2, 3, 4])
    row = _decode_one(png)
    flat = [x for r in pixels for x in r]
    assert row["width"] == 4 and row["height"] == 5
    assert row["sum_px"] == sum(flat)
    assert row["max_px"] == max(flat)


def test_decoder_concatenates_multiple_idat_chunks():
    pixels = [[1, 2, 3], [4, 5, 6]]
    raw = bytes([0, 1, 2, 3, 0, 4, 5, 6])
    comp = zlib.compress(raw)
    mid = len(comp) // 2
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", comp[:mid])
        + _chunk(b"IDAT", comp[mid:])
        + _chunk(b"IEND", b"")
    )
    row = _decode_one(png)
    assert row["sum_px"] == sum(x for r in pixels for x in r)


def test_decoder_rejects_crc_corruption():
    png = bytearray(_encode_one(b"hello png"))
    # flip one bit inside the IDAT payload (after the IHDR chunk)
    idat_at = bytes(png).index(b"IDAT")
    png[idat_at + 6] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        _decode_one(bytes(png))


def test_decoder_rejects_bad_signature():
    with pytest.raises(ValueError, match="signature"):
        _decode_one(b"NOTAPNG" + b"\x00" * 32)


def test_histogram_conserves_pixel_mass(spark, sf_dir):
    from argodb_mapreduce_spark.operators.multimodal import (
        multimodal_image_decode,
        multimodal_image_histogram,
    )

    hist = multimodal_image_histogram(spark, sf_dir)
    rows = hist.collect()
    assert [r["bin"] for r in rows] == list(range(16))
    total_binned = sum(r["n_px"] for r in rows)
    total_px = multimodal_image_decode(spark, sf_dir).agg({"n_px": "sum"}).collect()[0][0]
    assert total_binned == total_px


@settings(max_examples=50, deadline=None)
@given(raw=st.binary(min_size=0, max_size=5 * PNG_WIDTH + 7))
def test_roundtrip_property_arbitrary_bytes(raw):
    """Any byte string survives encode->decode with exact pixel stats —
    including bytes that look like PNG chunk boundaries or deflate
    sentinels inside the payload."""
    row = _decode_one(_encode_one(raw))
    h = max(1, -(-len(raw) // PNG_WIDTH))
    assert row["n_px"] == PNG_WIDTH * h
    assert row["sum_px"] == sum(raw)
    assert row["max_px"] == (max(raw) if raw else 0)


@settings(max_examples=25, deadline=None)
@given(
    pixels=st.lists(
        st.lists(st.integers(0, 255), min_size=3, max_size=3),
        min_size=1,
        max_size=6,
    ),
    filters=st.data(),
)
def test_decode_property_any_filter_sequence(pixels, filters):
    """For ANY per-row filter assignment the reader recovers the exact
    pixel grid (checked via sum/max, which detect any byte error)."""
    fts = [filters.draw(st.integers(0, 4)) for _ in pixels]
    row = _decode_one(_png_with_filters(pixels, fts))
    flat = [x for r in pixels for x in r]
    assert row["sum_px"] == sum(flat)
    assert row["max_px"] == max(flat)
