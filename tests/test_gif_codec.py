"""GIF87a codec unit tests: LZW layer edge cases and container
fail-loud paths, beyond the registry query's oracle check.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from argodb_mapreduce_spark.operators.multimodal import (
    PNG_WIDTH,
    _gif_encode_batches,
    _gif_reader,
    _lzw_codec,
)


def _encode_one(px: bytes) -> bytes:
    import pandas as pd

    batches = _gif_encode_batches(PNG_WIDTH)(
        iter([pd.DataFrame({"doc_id": [0], "content": [px]})])
    )
    return bytes(next(batches)["gif"][0])


def test_lzw_roundtrip_random_forces_table_reset():
    """70k random bytes exceed 4096 codes — the CLEAR/reset path and
    every code width 9..12 are exercised."""
    enc, dec = _lzw_codec()
    rng = np.random.default_rng(11)
    data = bytes(rng.integers(0, 256, 70_000, dtype=np.uint8))
    assert dec(enc(data)) == data


def test_lzw_roundtrip_kwkwk_case():
    """'aaaa...' emits the code == len(table) special case immediately."""
    enc, dec = _lzw_codec()
    for data in (b"a" * 100, b"ababababab" * 50, b"", b"x"):
        assert dec(enc(data)) == data


def test_lzw_truncation_fails_loud():
    enc, dec = _lzw_codec()
    full = enc(b"the quick brown fox jumps over the lazy dog" * 20)
    with pytest.raises(ValueError, match="truncated"):
        dec(full[: len(full) // 2])


def test_gif_container_roundtrip_and_geometry():
    parse = _gif_reader()
    px = bytes(range(256)) * 3
    (w, h, n_pal), idx = parse(_encode_one(px))
    assert w == PNG_WIDTH and n_pal == 256
    assert h == -(-len(px) // PNG_WIDTH)
    padded = px.ljust(w * h, b"\x00")
    assert idx.tobytes() == padded


def test_gif_reader_skips_gif89a_extensions():
    """A GIF89a graphic-control extension before the image descriptor
    must be skipped, not misparsed — real-world GIFs carry them."""
    parse = _gif_reader()
    buf = bytearray(_encode_one(b"hello gif"))
    # splice in: 89a version + a GCE block (0x21 0xF9, 4-byte sub-block)
    buf[3:6] = b"89a"
    desc = buf.index(0x2C, 13 + 768)  # image descriptor after the GCT
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    spliced = bytes(buf[:desc]) + gce + bytes(buf[desc:])
    (_, _, n_pal), idx = parse(spliced)
    assert n_pal == 256 and idx.tobytes().startswith(b"hello gif")


def test_gif_reader_rejects_interlace_and_bad_signature():
    parse = _gif_reader()
    buf = bytearray(_encode_one(b"abc"))
    desc = buf.index(0x2C, 13 + 768)
    buf[desc + 9] |= 0x40  # interlace flag in the image descriptor
    with pytest.raises(ValueError, match="interlaced"):
        parse(bytes(buf))
    with pytest.raises(ValueError, match="signature"):
        parse(b"NOTAGIF" + bytes(buf[7:]))


def test_gif_reader_rejects_pixel_count_mismatch():
    parse = _gif_reader()
    buf = bytearray(_encode_one(b"abcdef"))
    # Lie about the height in the image descriptor.
    desc = buf.index(0x2C, 13 + 768)
    struct.pack_into("<H", buf, desc + 7, 99)
    with pytest.raises(ValueError, match="pixel count"):
        parse(bytes(buf))
