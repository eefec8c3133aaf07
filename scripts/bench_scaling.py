"""Measure 1x-vs-10x wall-clock ratios for the most expensive operators.

VERDICT r7 next-step 1: convert the "scales linearly" claims from plan
arguments to data. Both corpora come from scripts/gen_scale_corpus.py
(same generator, same seed discipline, multi-file multi-row-group
parquet), so the ratio compares like with like; a linear operator on a
10x corpus should show wall ratio ≈ 10 or less (less when fixed
overhead — session, broadcast builds, Python worker spin-up — dominates
the 1x run).

Usage:
    python scripts/gen_scale_corpus.py --scale 1  --out /tmp/argodb_scale/x1
    python scripts/gen_scale_corpus.py --scale 10 --out /tmp/argodb_scale/x10
    python scripts/bench_scaling.py [--reps 2] [--ops op1,op2]

Prints one JSON line per op: {"op": ..., "t1": ..., "t10": ..., "ratio": ...}
and a final summary line. Results are recorded in SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from argodb_mapreduce_spark.session import get_spark  # noqa: E402

X1 = "/tmp/argodb_scale/x1"
X10 = "/tmp/argodb_scale/x10"


def _ops():
    """The ten ops named in the r7 verdict, resolved late so a broken
    module fails loudly per-op rather than killing the whole run."""
    from argodb_mapreduce_spark.operators.bi import (
        orders_rfm_segments,
        parts_abc_classification,
    )
    from argodb_mapreduce_spark.operators.clustering import dedup_semantic_clusters
    from argodb_mapreduce_spark.operators.dedup import (
        dedup_cdc_chunks,
        dedup_minhash_clusters,
    )
    from argodb_mapreduce_spark.operators.graph import graph_pagerank
    from argodb_mapreduce_spark.operators.similarity import (
        similarity_embedding_clusters,
        similarity_ivfpq_topk,
    )
    from argodb_mapreduce_spark.operators.curation import text_boilerplate_phrases
    from argodb_mapreduce_spark.operators.training_data import bpe_pair_stats

    # SemDeDup's K must scale with corpus size (k ≈ n/250 keeps expected
    # cluster population constant, so per-cluster pairwise work is flat).
    def semdedup_scaled(spark, sf_dir):
        from argodb_mapreduce_spark.catalog import table_rowcount

        k = max(8, table_rowcount(sf_dir, "embeddings") // 250)
        return dedup_semantic_clusters(spark, sf_dir, k=k)

    from argodb_mapreduce_spark.operators.multimodal import multimodal_jpeg_decode
    from argodb_mapreduce_spark.operators.similarity import (
        similarity_index_refresh,
        similarity_ivfpq_refined,
    )
    from argodb_mapreduce_spark.streaming.windows import stream_stateful_custom

    return {
        "similarity_embedding_clusters": similarity_embedding_clusters,
        "similarity_ivfpq_topk": similarity_ivfpq_topk,
        "dedup_cdc_chunks": dedup_cdc_chunks,
        "dedup_minhash_clusters": dedup_minhash_clusters,
        "dedup_semantic_clusters": semdedup_scaled,
        "graph_pagerank": graph_pagerank,
        "text_boilerplate_phrases": text_boilerplate_phrases,
        "bpe_pair_stats": bpe_pair_stats,
        "parts_abc_classification": parts_abc_classification,
        "orders_rfm_segments": orders_rfm_segments,
        # round-8 additions
        "stream_stateful_custom": stream_stateful_custom,
        "similarity_ivfpq_refined": similarity_ivfpq_refined,
        "multimodal_jpeg_decode": multimodal_jpeg_decode,
        # round-9 addition: the drift->retrain lifecycle (two full
        # encode passes + two searches + exact ground truth)
        "similarity_index_refresh": similarity_index_refresh,
        # late round-9 lakehouse ops: fresh-dir closures so every rep
        # does the REAL work (the registered queries cache fixtures,
        # which would time a warm re-read instead of the lifecycle)
        "dv_delete_lifecycle": _dv_delete_lifecycle,
        "bloom_build_probe": _bloom_build_probe,
        "mv_incremental_lifecycle": _mv_incremental_lifecycle,
        "stream_versioned_sink": _stream_sink,
        "merge_pruned_lifecycle": _merge_pruned_lifecycle,
        "cdf_lifecycle": _cdf_lifecycle,
        "zorder_rewrite_lifecycle": _zorder_rewrite_lifecycle,
        # round-9c DML/fork additions
        "update_where_lifecycle": _update_where_lifecycle,
        "clone_fork_lifecycle": _clone_fork_lifecycle,
        # round-9c codec addition (per-doc pure-Python LZW — linear)
        "multimodal_gif_decode": _gif_decode_op,
        # round-9c query additions (codegen + single-shuffle shapes)
        "dedup_url_canonical": _url_canonical_op,
        "join_point_in_time": _pit_join_op,
        # round-10 additions (VERDICT r9 #6): the r9 streaming ops'
        # argued O(changes)/O(batch) shapes, measured. Fixtures cache
        # after rep 1, so best-of-reps times the streaming DRAIN itself
        # (stream_mv_maintenance rebuilds its base+MV every run by
        # design — its wall is the full land+refresh lifecycle).
        "stream_versioned_ingest": _stream_ingest_op,
        "stream_change_feed_live": _stream_cdf_op,
        "stream_mv_maintenance": _stream_mv_op,
        # round-10: the Hive-partitioned store lifecycle (2 partitioned
        # appends + a stacked-prune scan + a partitioned DELETE + a
        # post-delete pruned read)
        "partitioned_store_lifecycle": _partitioned_lifecycle,
        # round-10: expectation-gated ingest and CDF-driven index upkeep
        "expect_quarantine_lifecycle": _expect_lifecycle,
        "cdf_index_maintenance_lifecycle": _cdf_index_lifecycle,
        # round-11: partitioned CDF delete recovery, partition-aware
        # pyds scan, quarantine repair-replay, filtered ANN
        "partitioned_cdf_lifecycle": _partitioned_cdf_lifecycle,
        "pyds_partitioned_scan_lifecycle": _pyds_partitioned_lifecycle,
        "quarantine_replay_lifecycle": _quarantine_replay_lifecycle,
        "similarity_filtered_topk": _filtered_ann_op,
        "pyds_partitioned_write_lifecycle": _pyds_partitioned_write_lifecycle,
        "mv_cdf_refresh_lifecycle": _mv_cdf_refresh_lifecycle,
    }


def _mv_cdf_refresh_lifecycle(spark, sf_dir):
    """Base (2 appends) + MV create + DV DELETE + append + CDF refresh:
    the r11 through-deletes maintenance. The refresh leg must track
    O(changes) — the delta segment + the DV-touched files — not base
    size."""
    from pyspark.sql import functions as F

    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.operators.materialized_view import (
        mv_create,
        mv_refresh,
    )
    from argodb_mapreduce_spark.sources.versioned import (
        delete_where,
        snapshot_read,
        versioned_write,
    )

    base = _fresh_dir("scale_mvcdf_base_")
    mv = _fresh_dir("scale_mvcdf_mv_")
    o = load_table(spark, sf_dir, "orders")
    versioned_write(o.filter(F.col("o_orderkey") % 3 == 0), base, mode="append")
    versioned_write(o.filter(F.col("o_orderkey") % 3 == 1), base, mode="append")
    mv_create(spark, base, mv, ["o_orderpriority"], ["o_orderkey"])
    delete_where(spark, base, [("o_orderstatus", "=", "F")])
    versioned_write(o.filter(F.col("o_orderkey") % 3 == 2), base, mode="append")
    summary = mv_refresh(spark, mv)
    assert summary["mode"] == "incremental-cdf", summary
    return snapshot_read(spark, mv).select("o_orderpriority", "n_rows", "sum_o_orderkey")


def _pyds_partitioned_write_lifecycle(spark, sf_dir):
    """Hive-layout write THROUGH the Python DataSource + a partition-
    predicate read back: the vectorized per-batch grouping must keep
    the write near-linear in data, and the read must plan only the
    matching branch's files."""
    import datetime as dt

    from pyspark.sql import functions as F

    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.sources.python_datasource import (
        FORMAT_NAME,
        read_versioned,
        register_datasource,
    )

    register_datasource(spark)
    out = _fresh_dir("scale_pydspw_")
    o = load_table(spark, sf_dir, "orders")
    (
        o.write.format(FORMAT_NAME)
        .option("partitionBy", "o_orderpriority")
        .mode("append")
        .save(out)
    )
    preds = [("o_orderpriority", "=", "1-URGENT")]
    return read_versioned(spark, out, predicates=preds).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("sum_key"),
    )


def _partitioned_cdf_lifecycle(spark, sf_dir):
    """2 Hive-partitioned appends + DV DELETE + change_feed(0, 2): the
    r11 delete-recovery leg. The feed cost must track O(changes) — the
    delta segment + the DV-touched files — not table size."""
    from pyspark.sql import functions as F

    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.sources.versioned import (
        change_feed,
        delete_where,
        versioned_write,
    )

    out = _fresh_dir("scale_hivecdf_")
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("timestamp")
    for part in (o.filter(F.col("o_orderdate") < cut), o.filter(F.col("o_orderdate") >= cut)):
        versioned_write(part, out, partition_by=("o_orderpriority",))
    delete_where(spark, out, [("o_orderstatus", "=", "F")])
    return change_feed(spark, out, 0, 2).groupBy("_change_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
    )


def _pyds_partitioned_lifecycle(spark, sf_dir):
    """2 partitioned appends + a partition-predicate scan THROUGH the
    Python DataSource: plan-time walk/decode must stay metadata-cheap
    and the scan must touch only the matching branch's files."""
    import datetime as dt

    from pyspark.sql import functions as F

    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.sources.python_datasource import read_versioned
    from argodb_mapreduce_spark.sources.versioned import versioned_write

    out = _fresh_dir("scale_pydspart_")
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("timestamp")
    for part in (o.filter(F.col("o_orderdate") < cut), o.filter(F.col("o_orderdate") >= cut)):
        versioned_write(part, out, partition_by=("o_orderpriority",))
    preds = [
        ("o_orderdate", ">=", dt.datetime(1998, 1, 1)),
        ("o_orderpriority", "=", "1-URGENT"),
    ]
    return read_versioned(spark, out, predicates=preds).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("sum_key"),
    )


def _quarantine_replay_lifecycle(spark, sf_dir):
    """Expect-gated ingest + repair + replay + idempotent re-run: every
    replay scan is over the quarantine (O(bad rows)), so the lifecycle
    should scale with the violating fraction, not the table."""
    import os

    from pyspark.sql import functions as F

    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.sources.versioned import (
        add_constraint,
        quarantine_replay,
        snapshot_read,
        versioned_write_expect,
    )

    out = _fresh_dir("scale_replay_")
    os.makedirs(out, exist_ok=True)
    add_constraint(spark, out, "price_cap", "o_totalprice < 150000.0")
    o = load_table(spark, sf_dir, "orders")
    versioned_write_expect(o, out, on_violation="quarantine")

    def repair(d):
        return d.withColumn(
            "o_totalprice",
            F.when(
                (F.col("o_totalprice") >= 150000.0) & (F.col("o_totalprice") < 180000.0),
                F.lit(149999.0),
            ).otherwise(F.col("o_totalprice")),
        )

    rep = quarantine_replay(spark, out, repair=repair)
    rep2 = quarantine_replay(spark, out, repair=repair)
    return snapshot_read(spark, out).agg(
        F.count(F.lit(1)).alias("n_main"),
        F.lit(rep["rows_reingested"]).alias("reingested"),
        F.lit(rep2["rows_reingested"]).alias("second"),
    )


def _filtered_ann_op(spark, sf_dir):
    from argodb_mapreduce_spark.operators.similarity import similarity_filtered_topk

    return similarity_filtered_topk(spark, sf_dir)


def _expect_lifecycle(spark, sf_dir):
    from pyspark.sql import functions as F

    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.sources.versioned import (
        add_constraint,
        snapshot_read,
        versioned_write_expect,
    )

    out = _fresh_dir("scale_expect_")
    import os

    os.makedirs(out, exist_ok=True)
    add_constraint(spark, out, "price_cap", "o_totalprice < 150000.0")
    o = load_table(spark, sf_dir, "orders")
    versioned_write_expect(o, out, on_violation="quarantine")
    return snapshot_read(spark, out).agg(F.count(F.lit(1)).alias("n_ok")).crossJoin(
        snapshot_read(spark, out + "_quarantine").agg(F.count(F.lit(1)).alias("n_bad"))
    )


def _cdf_index_lifecycle(spark, sf_dir):
    """Base index build is the dominant fixed term; the measured claim
    is the MAINTENANCE leg staying O(delta) — asserted structurally in
    tests; here the whole lifecycle (build + append + CDF upkeep +
    equality probe) must stay ~linear."""
    from pyspark.sql import functions as F

    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.operators.dedup import _band_index_for
    from argodb_mapreduce_spark.sources.versioned import (
        change_feed,
        snapshot_read,
        versioned_write,
    )

    docs_tbl = _fresh_dir("scale_cdfdocs_")
    idx_tbl = _fresh_dir("scale_cdfidx_")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    versioned_write(docs.filter(F.col("doc_id") % 5 != 0), docs_tbl)
    versioned_write(_band_index_for(snapshot_read(spark, docs_tbl, 0)), idx_tbl)
    versioned_write(docs.filter(F.col("doc_id") % 5 == 0), docs_tbl, mode="append")
    delta = change_feed(spark, docs_tbl, 0, 1).filter(
        F.col("_change_type") == "insert"
    ).select("doc_id", "text")
    versioned_write(_band_index_for(delta), idx_tbl, mode="append")
    return snapshot_read(spark, idx_tbl).groupBy("band").count()


def _partitioned_lifecycle(spark, sf_dir):
    from pyspark.sql import functions as F

    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.sources.versioned import (
        delete_where,
        snapshot_read,
        versioned_write,
    )

    out = _fresh_dir("scale_hivepart_")
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("timestamp")
    for part in (o.filter(F.col("o_orderdate") < cut), o.filter(F.col("o_orderdate") >= cut)):
        versioned_write(part, out, partition_by=("o_orderpriority",))
    import datetime as dt

    preds = [
        ("o_orderdate", ">=", dt.datetime(1998, 1, 1)),
        ("o_orderpriority", "=", "1-URGENT"),
    ]
    n1 = snapshot_read(spark, out, predicates=preds).count()
    delete_where(spark, out, [("o_orderstatus", "=", "F")])
    return snapshot_read(spark, out, predicates=preds).agg(
        F.count(F.lit(1)).alias("n_after"), F.lit(n1).alias("n_before")
    )


def _stream_ingest_op(spark, sf_dir):
    from argodb_mapreduce_spark.sources.python_datasource import stream_versioned_ingest

    return stream_versioned_ingest(spark, sf_dir)


def _stream_cdf_op(spark, sf_dir):
    from argodb_mapreduce_spark.sources.python_datasource import stream_change_feed_live

    return stream_change_feed_live(spark, sf_dir)


def _stream_mv_op(spark, sf_dir):
    from argodb_mapreduce_spark.streaming.windows import stream_mv_maintenance

    return stream_mv_maintenance(spark, sf_dir)


def _fresh_dir(prefix: str) -> str:
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    shutil.rmtree(d)
    return d


def _dv_delete_lifecycle(spark, sf_dir):
    """Two appends + one deletion-vector DELETE + a merge-on-read scan."""
    from pyspark.sql import functions as F

    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.sources.versioned import (
        delete_where,
        snapshot_read,
        versioned_write,
    )

    out = _fresh_dir("scale_dv_")
    o = load_table(spark, sf_dir, "orders")
    versioned_write(o.filter(F.col("o_orderkey") % 3 == 0), out)
    versioned_write(o.filter(F.col("o_orderkey") % 3 == 1), out)
    delete_where(spark, out, [("o_orderstatus", "=", "F")])
    return snapshot_read(spark, out).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("sum_key"),
    )


def _bloom_build_probe(spark, sf_dir):
    """4 bloom-indexed segments + 20 point-lookup probes + 1 pruned scan."""
    from pyspark.sql import functions as F

    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.sources.versioned import (
        prune_segments,
        snapshot_read,
        versioned_write,
    )

    out = _fresh_dir("scale_bloom_")
    o = load_table(spark, sf_dir, "orders")
    bucket = F.pmod(F.xxhash64("o_custkey"), 4)
    for i in range(4):
        versioned_write(o.filter(bucket == i), out, bloom_columns=("o_custkey",))
    keys = [
        r.o_custkey
        for r in o.select("o_custkey").distinct().orderBy("o_custkey").limit(20).collect()
    ]
    kept_total = sum(
        len(prune_segments(out, predicates=[("o_custkey", "=", int(k))])[0])
        for k in keys
    )
    return snapshot_read(
        spark, out, predicates=[("o_custkey", "=", int(keys[0]))]
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.lit(kept_total).alias("kept_total_20_probes"),
    )


def _mv_incremental_lifecycle(spark, sf_dir):
    """Create the MV at v0, append a delta, refresh incrementally."""
    from pyspark.sql import functions as F

    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.operators.materialized_view import (
        mv_create,
        mv_refresh,
    )
    from argodb_mapreduce_spark.sources.versioned import snapshot_read, versioned_write

    base, mv = _fresh_dir("scale_mv_base_"), _fresh_dir("scale_mv_")
    o = load_table(spark, sf_dir, "orders")
    versioned_write(o.filter(F.col("o_orderkey") % 5 <= 3), base)
    mv_create(spark, base, mv, ["o_orderpriority"], ["o_orderkey"])
    versioned_write(o.filter(F.col("o_orderkey") % 5 == 4), base)
    summary = mv_refresh(spark, mv)
    assert summary["mode"] == "incremental", summary
    return snapshot_read(spark, mv)


def _stream_sink(spark, sf_dir):
    # The registered query rebuilds its sink dir every run already.
    from argodb_mapreduce_spark.streaming.windows import stream_versioned_sink

    return stream_versioned_sink(spark, sf_dir)


def _merge_pruned_lifecycle(spark, sf_dir):
    """2 appends split by key range + a MERGE touching only the low
    half + read-back — the pruned copy-on-write upsert end to end."""
    from pyspark.sql import functions as F

    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.sources.versioned import merge_upsert, snapshot_read, versioned_write

    out = _fresh_dir("scale_merge_")
    o = load_table(spark, sf_dir, "orders")
    mid = 75000  # x1 orders span 0..150k; x10 0..1.5M — low half always touched
    versioned_write(o.filter(F.col("o_orderkey") < mid), out)
    versioned_write(o.filter(F.col("o_orderkey") >= mid), out)
    source = o.filter(F.col("o_orderkey") < mid // 10).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    summary = merge_upsert(spark, out, source, "o_orderkey")
    assert summary["segments_rewritten"] == 1, summary
    return snapshot_read(spark, out).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("sum_key"),
    )


def _cdf_lifecycle(spark, sf_dir):
    """2 appends + a DV delete + the O(changes) change feed over all."""
    from pyspark.sql import functions as F

    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.sources.versioned import change_feed, delete_where, versioned_write

    out = _fresh_dir("scale_cdf_")
    o = load_table(spark, sf_dir, "orders")
    versioned_write(o.filter(F.col("o_orderkey") % 2 == 0), out)
    versioned_write(o.filter(F.col("o_orderkey") % 2 == 1), out)
    delete_where(spark, out, [("o_orderstatus", "=", "F")])
    return change_feed(spark, out, 0, 2).groupBy("_change_type").agg(
        F.count(F.lit(1)).alias("n_rows")
    )


def _zorder_rewrite_lifecycle(spark, sf_dir):
    """2 random appends + OPTIMIZE ZORDER + a both-axis pruned probe."""
    from pyspark.sql import functions as F

    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.sources.versioned import (
        snapshot_read,
        versioned_write,
        zorder_rewrite,
    )

    out = _fresh_dir("scale_zorder_")
    o = load_table(spark, sf_dir, "orders")
    bucket = F.pmod(F.xxhash64("o_orderkey"), 2)
    for i in range(2):
        versioned_write(o.filter(bucket == i), out)
    v = zorder_rewrite(spark, out, "o_custkey", "o_totalprice")
    b = o.agg(
        (F.min("o_custkey") + (F.max("o_custkey") - F.min("o_custkey")) / 8.0).alias("ck")
    ).first()
    return snapshot_read(
        spark, out, v, predicates=[("o_custkey", "<=", float(b.ck))]
    ).agg(F.count(F.lit(1)).alias("n_rows"))


def _gif_decode_op(spark, sf_dir):
    from argodb_mapreduce_spark.operators.multimodal import multimodal_gif_decode

    return multimodal_gif_decode(spark, sf_dir)


def _url_canonical_op(spark, sf_dir):
    from argodb_mapreduce_spark.operators.dedup import dedup_url_canonical

    return dedup_url_canonical(spark, sf_dir)


def _pit_join_op(spark, sf_dir):
    from argodb_mapreduce_spark.operators.sessions import join_point_in_time

    return join_point_in_time(spark, sf_dir)


def _update_where_lifecycle(spark, sf_dir):
    """2 appends split by key range + an UPDATE whose predicate touches
    only the low half + read-back — pruned copy-on-write UPDATE end to
    end. The updated fraction is CONSTANT (a fixed key prefix of the
    low segment), so wall should track the rewritten segment size."""
    from pyspark.sql import functions as F

    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.sources.versioned import (
        snapshot_read,
        update_where,
        versioned_write,
    )

    out = _fresh_dir("scale_update_")
    o = load_table(spark, sf_dir, "orders")
    mid = 75000  # x1 orders span 0..150k; x10 0..1.5M — low half always touched
    versioned_write(o.filter(F.col("o_orderkey") < mid), out)
    versioned_write(o.filter(F.col("o_orderkey") >= mid), out)
    summary = update_where(
        spark,
        out,
        [("o_orderkey", "<", mid // 10)],
        {"o_totalprice": F.col("o_totalprice") * 2},
    )
    assert summary["segments_rewritten"] == 1, summary
    return snapshot_read(spark, out).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("sum_key"),
    )


def _clone_fork_lifecycle(spark, sf_dir):
    """2 appends + shallow clone + a clone-local append + both-side
    read-back. The clone itself must be O(manifest): wall is dominated
    by the builds and reads, with the clone step itself ~constant."""
    from pyspark.sql import functions as F

    from argodb_mapreduce_spark.catalog import load_table
    from argodb_mapreduce_spark.sources.versioned import (
        clone_table,
        snapshot_read,
        versioned_write,
    )

    src = _fresh_dir("scale_clone_src_")
    dst = _fresh_dir("scale_clone_dst_")
    o = load_table(spark, sf_dir, "orders")
    versioned_write(o.filter(F.col("o_orderkey") % 3 == 0), src)
    versioned_write(o.filter(F.col("o_orderkey") % 3 == 1), src)
    clone_table(src, dst)
    versioned_write(o.filter(F.col("o_orderkey") % 3 == 2), dst)
    a = snapshot_read(spark, src).agg(F.count(F.lit(1)).alias("n_rows"))
    b = snapshot_read(spark, dst).agg(F.count(F.lit(1)).alias("n_rows"))
    return a.unionAll(b)


def time_op(spark, fn, sf_dir: str, reps: int) -> tuple[float, int]:
    """Best-of-reps wall seconds + result row count. The noop sink
    materializes every output column (count() would license pruning the
    real consumer doesn't get)."""
    best, rows = float("inf"), -1
    for _ in range(reps):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    rows = fn(spark, sf_dir).count()
    return best, rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--ops", default=None, help="comma-separated subset")
    a = ap.parse_args()
    ops = _ops()
    if a.ops:
        ops = {k: ops[k] for k in a.ops.split(",")}
    spark = get_spark("bench-scaling")
    out = {}
    for name, fn in ops.items():
        try:
            t1, r1 = time_op(spark, fn, X1, a.reps)
            t10, r10 = time_op(spark, fn, X10, a.reps)
            rec = {
                "op": name,
                "t1": round(t1, 3),
                "t10": round(t10, 3),
                "ratio": round(t10 / t1, 2),
                "rows1": r1,
                "rows10": r10,
            }
        except Exception as e:  # noqa: BLE001 - record and continue
            rec = {"op": name, "err": f"{type(e).__name__}: {e}"[:300]}
        out[name] = rec
        print(json.dumps(rec), flush=True)
    ratios = [r["ratio"] for r in out.values() if "ratio" in r]
    print(
        json.dumps(
            {
                "metric": "scaling_ratio_10x",
                "n_ops": len(ratios),
                "max_ratio": max(ratios) if ratios else None,
                "median_ratio": sorted(ratios)[len(ratios) // 2] if ratios else None,
            }
        )
    )


if __name__ == "__main__":
    main()
