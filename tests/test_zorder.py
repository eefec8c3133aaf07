"""Z-order layout: pruning evidence from real parquet footers, plus a
pure-Python Morton-code model check."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from argodb_mapreduce_spark.operators.zorder import (
    Z_BITS,
    linear_layout,
    morton_code,
    zorder_layout,
)

#: Second-dimension (o_totalprice) range predicate used for the overlap
#: comparison — matches sink_zorder_roundtrip's filter.
PRICE_LO, PRICE_HI = 150000.0, 250000.0


def _overlapping_files(path: str, column: str, lo: float, hi: float) -> tuple[int, int]:
    """(n_overlapping, n_total) from file-footer column statistics."""
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    n_overlap = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        col_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[column]
        mn = min(md.row_group(g).column(col_idx).statistics.min for g in range(md.num_row_groups))
        mx = max(md.row_group(g).column(col_idx).statistics.max for g in range(md.num_row_groups))
        if mx >= lo and mn < hi:
            n_overlap += 1
    return n_overlap, len(files)


def test_zorder_prunes_second_dimension(spark, sf_dir):
    """A price-range predicate must overlap a strict subset of z-ordered
    files, while the custkey-sorted layout gives price no locality at
    all (every file overlaps)."""
    z_overlap, z_total = _overlapping_files(
        zorder_layout(spark, sf_dir), "o_totalprice", PRICE_LO, PRICE_HI
    )
    l_overlap, l_total = _overlapping_files(
        linear_layout(spark, sf_dir), "o_totalprice", PRICE_LO, PRICE_HI
    )
    assert l_overlap == l_total, "custkey-sorted layout should give price no locality"
    assert z_overlap < z_total, f"z-order must prune some files: {z_overlap}/{z_total}"
    assert z_overlap / z_total < l_overlap / l_total


def test_zorder_layouts_hold_identical_data(spark, sf_dir):
    z = spark.read.parquet(zorder_layout(spark, sf_dir)).drop("zval")
    lin = spark.read.parquet(linear_layout(spark, sf_dir))
    assert z.count() == lin.count()
    assert z.subtract(lin).count() == 0 and lin.subtract(z).count() == 0


def test_morton_code_matches_python_model(spark):
    """The expression chain must equal the straightforward bit-interleave
    (x bit i -> z bit 2i, y bit i -> z bit 2i+1) for every grid cell of
    a smaller grid and the corners/edges of the full one."""
    from pyspark.sql import functions as F

    def model(x: int, y: int, bits: int = Z_BITS) -> int:
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    top = (1 << Z_BITS) - 1
    cells = [(x, y) for x in range(8) for y in range(8)]
    cells += [(x, y) for x in (0, 1, 127, 128, top) for y in (0, 1, 127, 128, top)]
    df = spark.createDataFrame(cells, "x int, y int").withColumn(
        "z", morton_code(F.col("x"), F.col("y"))
    )
    for r in df.collect():
        assert r["z"] == model(r["x"], r["y"]), (r["x"], r["y"])


def test_morton_locality_property():
    """Monotone block property the pruning rests on: all cells of an
    aligned 2^k x 2^k block form one contiguous z-range, so a file
    holding a z-range has a bounded 2-D bounding box."""

    def model(x, y, bits=Z_BITS):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    k = 3  # 8x8 blocks on the 256x256 grid
    for bx in (0, 5, 31):
        for by in (0, 7, 31):
            zs = sorted(
                model((bx << k) + dx, (by << k) + dy)
                for dx in range(1 << k)
                for dy in range(1 << k)
            )
            assert zs[-1] - zs[0] == len(zs) - 1, "block must map to a contiguous z-range"
