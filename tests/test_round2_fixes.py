"""Round-2 regression tests (VERDICT/ADVICE r1 findings).

Covers: the agg_median_manual odd-group fix (checked against DuckDB's
own MEDIAN, not our oracle SQL — an independent implementation, so a
shared-formula bug cannot hide), the raw ArrayType scan that the
registered scan_embeddings query no longer exposes, parquet-metadata
row counts, registry import health, and the driver-hashability contract
(every registered query: no top-level array/map/struct column, and a
DuckDB oracle) for the driver's 50-query correctness window.
"""

from __future__ import annotations

import duckdb
import pytest

from argodb_mapreduce_spark import registry
from argodb_mapreduce_spark.catalog import load_table, table_path, table_rowcount


def test_median_matches_duckdb_builtin(spark, sf_dir):
    # ADVICE r1 (high): for odd-sized groups the old formula selected the
    # middle row once and divided by 2. DuckDB's MEDIAN is an independent
    # implementation (interpolated for even n, exact middle for odd n).
    from argodb_mapreduce_spark.functions.stats import agg_median_manual

    got = {r["o_orderstatus"]: r["median_price"] for r in agg_median_manual(spark, sf_dir).collect()}
    con = duckdb.connect()
    expected = dict(
        con.execute(
            f"SELECT o_orderstatus, MEDIAN(o_totalprice) FROM '{table_path(sf_dir, 'orders')}' "
            "GROUP BY o_orderstatus"
        ).fetchall()
    )
    assert set(got) == set(expected)
    for k in expected:
        assert got[k] == pytest.approx(expected[k], abs=1e-6), k


def test_median_odd_group_exact(spark):
    # Minimal odd-group case: median of {1, 2, 3} must be 2, not 1.
    import pandas as pd

    from argodb_mapreduce_spark.functions.stats import agg_median_manual

    df = spark.createDataFrame(
        pd.DataFrame(
            {"o_orderstatus": ["X", "X", "X"], "o_totalprice": [1.0, 2.0, 3.0], "o_orderkey": [1, 2, 3]}
        )
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "orders.parquet"))
        out = agg_median_manual(spark, d).collect()
    assert out[0]["median_price"] == 2.0


def test_embeddings_raw_array_scan(spark, sf_dir):
    # The registered scan_embeddings emits a quantized string (the driver
    # hash cannot take arrays); the raw ArrayType(Float) read lives here.
    import pyarrow.parquet as pq

    df = load_table(spark, sf_dir, "embeddings")
    assert dict(df.dtypes)["embedding"] == "array<float>"
    row = df.orderBy("vec_id").first()
    tbl = pq.read_table(table_path(sf_dir, "embeddings"))
    idx = tbl.column("vec_id").to_pylist().index(row["vec_id"])
    expected = tbl.column("embedding").to_pylist()[idx]
    assert row["embedding"] == pytest.approx(expected)


def test_table_rowcount_is_metadata_only(spark, sf_dir):
    for name in ("embeddings", "orders"):
        assert table_rowcount(sf_dir, name) == load_table(spark, sf_dir, name).count()


def test_registry_imports_clean():
    assert registry.import_errors() == {}


def test_driver_window_contract(spark, sf_dir):
    """First-50 registration-order queries (the driver's correctness
    window): every one has a DuckDB oracle, and no query in the whole
    registry emits a top-level array/map/struct (the driver's pandas
    value hash raises 'unhashable type: list' — CORRECTNESS_r01)."""
    qs = list(registry.all_queries().items())
    for name, q in qs[:50]:
        assert q.oracle is not None, f"{name} is inside the driver window without an oracle"
    for name, q in qs:
        if name.startswith("stream_") and name.endswith(("_live", "_watermark", "_counts")):
            continue  # real streaming runs are exercised in test_streaming_late
        df = q.fn(spark, sf_dir)
        bad = [(c, t) for c, t in df.dtypes if t.startswith(("array", "map", "struct"))]
        assert not bad, f"{name} emits driver-unhashable columns: {bad}"


def test_driver_witnessed_union_covers_registry():
    """Every registered query is either already driver-witnessed (has a
    row in some CORRECTNESS_r*.json) or sits inside the current 50-slot
    driver window — i.e. after this round's driver run the witnessed
    union reaches the full registry (VERDICT r5 next-step 7)."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    witnessed: set[str] = set()
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            witnessed.update(json.load(fh).keys())
    window = set(list(registry.all_queries())[:50])
    unwitnessed = set(registry.all_queries()) - witnessed - window
    assert not unwitnessed, (
        f"{len(unwitnessed)} queries have no driver evidence and no window slot: "
        f"{sorted(unwitnessed)[:10]}"
    )


def test_targeted_salted_join_equals_plain(spark, sf_dir):
    """Targeted salting (hot keys only) is result-identical to the
    plain join, via both the self-detected and the precomputed
    hot-key paths, on data where hot and cold branches BOTH carry rows."""
    from argodb_mapreduce_spark.operators.merge import (
        detect_hot_keys,
        targeted_salted_join,
    )

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    plain = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
    expected = {(r[0], r[1]) for r in plain.collect()}
    hot = detect_hot_keys(li, "l_orderkey", hot_factor=1.5)
    assert 0 < hot.count() < li.select("l_orderkey").distinct().count()
    for hk in (None, hot):
        got = (
            targeted_salted_join(li, o, "l_orderkey", "o_orderkey", hot_keys=hk)
            .groupBy("o_orderpriority")
            .count()
        )
        assert {(r[0], r[1]) for r in got.collect()} == expected
