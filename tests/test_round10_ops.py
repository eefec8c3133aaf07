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


def test_targeted_salted_join_plan_shapes(spark, sf_dir):
    """The hot-key set and detection stats ride BROADCAST joins (never
    a shuffle of the fact side for metadata), and the plan is a union
    of the cold single-copy join and the salted hot join."""
    from argodb_mapreduce_spark.operators.merge import targeted_salted_join
    from argodb_mapreduce_spark.plans.checks import explain_str

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    df = targeted_salted_join(li, o, "l_orderkey", "o_orderkey")
    plan = explain_str(df, "simple")
    assert "BroadcastHashJoin" in plan  # hot tagging + semi + stats
    assert "Union" in plan  # cold branch + hot branch
    assert "CartesianProduct" not in plan


def test_zorder_rewrite_on_partitioned_table(spark, tmp_path):
    """OPTIMIZE ZORDER reads a partitioned table through the snapshot
    reader (union of basePath branches) and rewrites flat z-segments —
    the clustered layout replaces the Hive layout by design."""
    from argodb_mapreduce_spark.sources.versioned import (
        _read_manifest,
        snapshot_read,
        versioned_write,
        zorder_rewrite,
    )

    path = str(tmp_path / "zpart")
    df = spark.range(400).select(
        F.col("id").alias("x"),
        ((F.col("id") * 37) % 400).alias("y"),
        (F.col("id") % 4).cast("int").alias("k"),
    )
    versioned_write(df, path, partition_by=("k",))
    v = zorder_rewrite(spark, path, "x", "y")
    entry = _read_manifest(path)[-1]
    assert entry["version"] == v and "partition_by" not in entry
    back = snapshot_read(spark, path)
    assert back.count() == 400
    assert sorted(back.columns) == ["k", "x", "y"]  # partition col kept as data
    assert back.groupBy("k").count().count() == 4


def test_binpack_on_partitioned_table(spark, tmp_path):
    """Bin-packing reads small partitioned segments through the union
    helper, rewrites them flat, and carries any unpacked partitioned
    segment with its layout ledger intact."""
    from argodb_mapreduce_spark.sources.versioned import (
        _read_manifest,
        compact_binpack,
        snapshot_read,
        versioned_write,
    )

    path = str(tmp_path / "bp_part")
    for lo in (0, 100, 200):
        df = spark.range(lo, lo + 100).select(
            F.col("id").alias("v"), (F.col("id") % 3).cast("int").alias("k")
        )
        versioned_write(df, path, partition_by=("k",))
    res = compact_binpack(spark, path, target_bytes=1 << 30)  # all bins pack
    assert res["bins_rewritten"] >= 1
    assert snapshot_read(spark, path).count() == 300
    assert snapshot_read(spark, path).select("v").distinct().count() == 300


def test_targeted_salted_join_tolerates_shared_column_names(spark):
    """r10 ADVICE: sides sharing a non-key column name must join like a
    plain equi-join (duplicate-named output) instead of failing the
    hot/cold union with an ambiguous-column error."""
    from argodb_mapreduce_spark.operators.merge import targeted_salted_join

    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.lit("l").alias("tag")
    )
    right = spark.range(5).select(
        F.col("id").alias("rk"), F.lit("r").alias("tag")  # 'tag' collides
    )
    out = targeted_salted_join(left, right, "k", "rk", hot_factor=0.5)
    plain = left.join(right, left["k"] == right["rk"])
    assert out.count() == plain.count() == 100
    assert [f.name for f in out.schema.fields] == [f.name for f in plain.schema.fields]
    # both tag copies survive, in plain-join positions
    assert out.toPandas().columns.tolist().count("tag") == 2


def test_filtered_ann_strategy_choice_and_recall(spark, sf_dir):
    """Filtered ANN (r11): selective predicate -> pre-filter, broad
    predicate -> post-filter; both regimes return full top-k sets and a
    non-vacuous recall self-check against the exact filtered baseline."""
    from argodb_mapreduce_spark import registry

    df = registry.all_queries()["similarity_filtered_topk"].fn(spark, sf_dir)
    rows = {r.regime: r for r in df.collect()}
    assert rows["low"].strategy == "pre-filter"
    assert rows["high"].strategy == "post-filter"
    assert rows["low"].selectivity_pct < 50 < rows["high"].selectivity_pct
    for r in rows.values():
        assert r.n_results > 0
        assert 0 < r.recall_vs_exact_pct <= 100
