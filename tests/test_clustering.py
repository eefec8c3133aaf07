"""Multi-iteration k-means over the assign/update helpers: the driver
loop the registered one-step queries are building blocks for."""

from __future__ import annotations

from pyspark.sql import functions as F

from argodb_mapreduce_spark.operators import clustering


def _inertia(e, cent) -> int:
    a = clustering.assign(e, cent)
    return a.agg(F.sum("dist2")).collect()[0][0]


def test_kmeans_three_rounds_inertia_nonincreasing(spark, sf_dir):
    e = clustering._quantized(spark, sf_dir)
    cent = e.filter(F.col("vec_id") < clustering.K_CLUSTERS).select(
        F.col("vec_id").alias("cid"), F.col("qe").alias("qc")
    )
    inertias = []
    for _ in range(3):
        assigned = clustering.assign(e, cent)
        inertias.append(assigned.agg(F.sum("dist2")).collect()[0][0])
        cent = clustering.update(e, assigned)
    inertias.append(_inertia(e, cent))

    # Lloyd's algorithm: inertia is (weakly) monotone non-increasing.
    # Quantized means round each component to the grid, which can cost at
    # most a hair of monotonicity — allow a 0.1% slack per step.
    for prev, nxt in zip(inertias, inertias[1:]):
        assert nxt <= prev * 1.001, inertias
    assert inertias[-1] < inertias[0]

    # Every centroid keeps the full dimension count through update().
    dims = cent.select(F.size("qc").alias("d")).distinct().collect()
    assert len(dims) == 1 and dims[0]["d"] == 64
