"""K-means clustering steps over embeddings (SURVEY.md §2.C3 adjunct).

Lloyd's algorithm expressed as DataFrame ops — the iterative workload
the reference's map/reduce surface was classically used for (assignment
= map with broadcast centroids, update = reduce by centroid id; cf. the
delegated-surface rows SURVEY.md §2.B3/B4). One full iteration is
oracle-checked end-to-end:

- `kmeans_assign` — assign every vector to its nearest centroid
  (squared-L2, deterministic init: the K lowest vec_ids).
- `kmeans_lloyd_step` — recompute per-centroid means after assignment
  (the "update" half), via posexplode + integer-exact component sums.

Determinism: vectors are quantized to the 2^-20 integer grid (see
operators/similarity.py) so squared distances are pure int64 arithmetic
— 64 dims × (2·2^21)^2 < 2^50 — and argmin ties break on centroid id.
Component means divide exact integer sums by counts, bit-identical in
both engines.

Scale: assignment is a broadcast cross join against K centroids (K is
small by definition) — map-side, no shuffle of the vector table; the
update shuffles O(K × dims) partial sums, never O(vectors). This is
the standard distributed-k-means shape and survives 100 TB unchanged;
full multi-iteration training is a driver loop over these two steps
with the centroid table re-broadcast each round (tests run 3 rounds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from argodb_mapreduce_spark.catalog import load_table, table_rowcount
from argodb_mapreduce_spark.operators.similarity import _Q, _quantize
from argodb_mapreduce_spark.registry import register

K_CLUSTERS = 8

_SQL_QUANT = f"""
    q AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(ROUND(CAST(x AS DOUBLE) * {float(_Q)}) AS BIGINT)) AS qe
      FROM embeddings
    ),
    cent AS (SELECT vec_id AS cid, qe AS qc FROM q WHERE vec_id < {K_CLUSTERS}),
    assigned AS (
      SELECT v.vec_id, c.cid,
             CAST(list_sum(list_transform(range(1, len(v.qe) + 1),
                           i -> (v.qe[i] - c.qc[i]) * (v.qe[i] - c.qc[i]))) AS BIGINT) AS dist2
      FROM q v CROSS JOIN cent c
      QUALIFY ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY dist2 ASC, c.cid ASC) = 1
    )
"""


def _dist2(qa: Column, qb: Column) -> Column:
    """Exact integer squared-L2 distance between quantized vectors."""
    diffs = F.zip_with(qa, qb, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffs, F.lit(0).cast("long"), lambda acc, x: acc + x)


def assign(e: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: (vec_id, qe) × broadcast centroids
    (cid, qc) → (vec_id, cid, dist2), ties on centroid id.

    Row-per-(vector, centroid) SQL form — O(n·k) interpreted pairs plus
    an n-partition argmin window. Fine at fixture k, but when k scales
    with corpus size (SemDeDup) the pair fan-out is quadratic; use
    `assign_blocked` there (measured 26x wall at 10x corpus with
    k ∝ n through this path, ~linear through the blocked matmul)."""
    pairs = e.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cid", _dist2(F.col("qe"), F.col("qc")).alias("dist2")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("dist2").asc(), F.col("cid").asc())
    return (
        pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )


def assign_blocked(e: DataFrame, cent: DataFrame, n_rows: int) -> DataFrame:
    """Nearest-centroid assignment as one dense matmul per vector block.

    Same contract and bit-exact same output as `assign` (exact integer
    squared-L2, ties to the lowest cid), different physical shape: the
    vector table is hashed into ~1024-row blocks, the centroid table is
    replicated per block (a k × n_blocks build — tiny×tiny cross join),
    and a cogrouped applyInPandas computes the full n×k distance matrix
    per block in one float64 BLAS matmul. Per-(vector, centroid) cost
    drops from an interpreted SQL expression + n-partition window to a
    vectorized MAC — the shape that keeps SemDeDup assignment linear
    when k scales with corpus size (SemDeDup's production K is ~100k).

    Exactness: quantized components sit below 2^21 (2^-20 grid, |x|≲1),
    so every product < 2^42 and every ≤512-term partial sum < 2^53 —
    float64 arithmetic on integers is exact and the int64 cast is
    lossless; wider/larger inputs fall back to int64 matmul. argmin
    returns the FIRST minimal column, and centroids are sorted by cid,
    so ties break to the lowest cid exactly like the SQL row_number."""
    n_blocks = max(1, n_rows // 1024)
    # Hash before pmod: raw ids can be non-uniform modulo n_blocks
    # (strided ingest ids would pile whole strides into one block and
    # blow the per-group dense matrix); xxhash64 equidistributes any id
    # scheme. Block membership only shapes the physical grouping — the
    # per-row argmin output is identical either way (ADVICE r8).
    eb = e.withColumn(
        "blk", F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n_blocks)).cast("int")
    )
    cb = cent.crossJoin(
        cent.sparkSession.range(n_blocks).select(F.col("id").cast("int").alias("blk"))
    )

    def score(left, right):
        import numpy as np
        import pandas as pd

        if left.empty:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series(dtype="int64"),
                    "cid": pd.Series(dtype="int64"),
                    "dist2": pd.Series(dtype="int64"),
                }
            )
        right = right.sort_values("cid")
        Q = np.stack(left["qe"].to_numpy()).astype("int64")
        C = np.stack(right["qc"].to_numpy()).astype("int64")
        hi = max(np.abs(Q).max(initial=0), np.abs(C).max(initial=0))
        if hi < (1 << 21) and Q.shape[1] <= 512:
            Qf, Cf = Q.astype("float64"), C.astype("float64")
            D = (
                (Qf * Qf).sum(axis=1)[:, None]
                - 2.0 * (Qf @ Cf.T)
                + (Cf * Cf).sum(axis=1)[None, :]
            ).astype("int64")
        else:  # pragma: no cover - fixture grid stays below 2^21
            D = (
                (Q * Q).sum(axis=1)[:, None] - 2 * (Q @ C.T) + (C * C).sum(axis=1)[None, :]
            )
        idx = D.argmin(axis=1)
        return pd.DataFrame(
            {
                "vec_id": left["vec_id"].to_numpy(),
                "cid": right["cid"].to_numpy()[idx],
                "dist2": D[np.arange(len(idx)), idx],
            }
        )

    return (
        eb.groupBy("blk")
        .cogroup(cb.groupBy("blk"))
        .applyInPandas(score, schema="vec_id long, cid long, dist2 long")
    )


def update(e: DataFrame, assigned: DataFrame) -> DataFrame:
    """Recompute centroids: per-(cid, pos) exact integer mean of the
    assigned vectors' quantized components → (cid, qc) arrays."""
    comp = (
        e.join(assigned.select("vec_id", "cid"), "vec_id")
        .select("cid", F.posexplode("qe").alias("pos", "qv"))
        .groupBy("cid", "pos")
        .agg(F.sum("qv").alias("s"), F.count(F.lit(1)).alias("n"))
        .select("cid", "pos", F.round(F.col("s") / F.col("n")).cast("long").alias("qmean"))
    )
    return comp.groupBy("cid").agg(
        F.array_sort(F.collect_list(F.struct("pos", "qmean"))).alias("pq")
    ).select("cid", F.col("pq.qmean").alias("qc"))


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", _quantize(F.col("embedding")).alias("qe"))


@register(
    "kmeans_assign",
    oracle=f"""
    WITH {_SQL_QUANT}
    SELECT vec_id, CAST(cid AS BIGINT) AS centroid_id, dist2 FROM assigned
    """,
    tags=("clustering", "vector"),
    doc=(
        f"K-means assignment step: each vector to its nearest of "
        f"{K_CLUSTERS} deterministic centroids (the lowest vec_ids) by "
        "exact integer squared-L2 on the 2^-20 grid, ties to the lower "
        "centroid id. Broadcast cross join + per-vector argmin window — "
        "the vector table never shuffles."
    ),
)
def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _quantized(spark, sf_dir)
    cent = e.filter(F.col("vec_id") < K_CLUSTERS).select(
        F.col("vec_id").alias("cid"), F.col("qe").alias("qc")
    )
    return assign_blocked(e, cent, table_rowcount(sf_dir, "embeddings")).select(
        "vec_id", F.col("cid").alias("centroid_id"), "dist2"
    )


@register(
    "kmeans_lloyd_step",
    oracle=f"""
    WITH {_SQL_QUANT}
    SELECT a.cid AS centroid_id,
           CAST(i AS INT) AS pos,
           CAST(CAST(SUM(v.qe[i + 1]) AS BIGINT) AS DOUBLE)
             / (COUNT(*) * {float(_Q)}) AS centroid,
           CAST(COUNT(*) AS BIGINT) AS n_assigned
    FROM assigned a
    JOIN q v USING (vec_id),
    UNNEST(range(0, len(v.qe))) AS u(i)
    GROUP BY a.cid, i
    """,
    tags=("clustering", "vector", "agg"),
    doc=(
        "K-means update step (one full Lloyd iteration with "
        "kmeans_assign): per-centroid component means of the assigned "
        "vectors. posexplode → partial-aggregated integer sums — "
        "shuffle volume O(K × dims); the final mean is one exact "
        "int-sum / count division, bit-identical across engines."
    ),
)
def kmeans_lloyd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _quantized(spark, sf_dir)
    cent = e.filter(F.col("vec_id") < K_CLUSTERS).select(
        F.col("vec_id").alias("cid"), F.col("qe").alias("qc")
    )
    assigned = assign_blocked(e, cent, table_rowcount(sf_dir, "embeddings"))
    comp = (
        e.join(assigned.select("vec_id", "cid"), "vec_id")
        .select("cid", F.posexplode("qe").alias("pos", "qv"))
        .groupBy("cid", "pos")
        .agg(F.sum("qv").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    return comp.select(
        F.col("cid").alias("centroid_id"),
        "pos",
        (F.col("s").cast("double") / (F.col("n") * F.lit(float(_Q)))).alias("centroid"),
        F.col("n").alias("n_assigned"),
    )


#: Power-iteration count for the top principal component (fixed — keeps
#: the plan static and the oracle a finite CTE chain, like PageRank).
PCA_ITERS = 3


def _pca_sql() -> str:
    from argodb_mapreduce_spark.functions.oracle_safe import sql_gsum

    q = float(_Q)
    parts = [
        f"""
    WITH qv AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * {q!r}) AS BIGINT)) AS qemb
      FROM embeddings
    ), cells AS (
      SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
             qemb[i + 1] AS qi, qemb[j + 1] AS qj
      FROM qv,
           UNNEST(range(0, len(qemb))) AS u1(i),
           UNNEST(range(0, len(qemb))) AS u2(j)
    ), moments AS (
      SELECT i, j,
             CAST(CAST(SUM(qi * qj) AS VARCHAR) AS DOUBLE) AS sqq,
             CAST(CAST(SUM(qi) AS VARCHAR) AS DOUBLE) AS sqi,
             CAST(CAST(SUM(qj) AS VARCHAR) AS DOUBLE) AS sqj,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM cells GROUP BY i, j
    ), cov AS (
      SELECT i, j,
             (sqq / n - (sqi / n) * (sqj / n)) / {q!r} / {q!r} AS c
      FROM moments
    ), v0 AS (
      SELECT DISTINCT i AS pos, CAST(1 AS DOUBLE) AS v FROM cov
    )"""
    ]
    for k in range(1, PCA_ITERS + 1):
        prev = f"v{k - 1}"
        parts.append(
            f""", w{k} AS (
      SELECT cov.i AS pos, {sql_gsum("cov.c * p.v")} AS w
      FROM cov JOIN {prev} p ON p.pos = cov.j GROUP BY cov.i
    ), n{k} AS (
      SELECT SQRT({sql_gsum("w * w")}) AS nrm FROM w{k}
    ), v{k} AS (
      SELECT w{k}.pos, w{k}.w / n{k}.nrm AS v FROM w{k} CROSS JOIN n{k}
    )"""
        )
    parts.append(
        f"""
    SELECT pos, v AS loading FROM v{PCA_ITERS}
    """
    )
    return "".join(parts)


@register(
    "embedding_pca_top_component",
    oracle=_pca_sql(),
    tags=("similarity", "vector", "iterative", "ml"),
    doc=(
        f"Top principal component of the embedding corpus: exact-integer "
        f"covariance moments on the 2^-20 quantization grid, then "
        f"{PCA_ITERS} power iterations over the dims x dims covariance "
        "matrix with grid-sum matvecs and an IEEE sqrt normalization — "
        "every float op deterministic, so the component loadings are "
        "bit-identical across engines and parallelism. PCA as a "
        "dataflow: no ML library, oracle-checkable."
    ),
)
def embedding_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant eigenvector of the embedding covariance (whitening /
    drift-analysis primitive for an embedding pipeline).

    Scale design: the only corpus-sized stage is the Gram accumulation —
    an Arrow-batched mapInPandas computing one exact int64 Q^T Q per
    chunk, so 100 TB of vectors reduces to dims^2 = 4096 integer
    partials per chunk (decimal-summed exactly across chunks), with no
    row inflation of the scan stage. Power
    iterations are joins over the 4096-row covariance — broadcast-sized
    — with the same chained-CTE oracle shape as graph_pagerank. The
    quantized integer moments make the covariance bit-identical in both
    engines; v0 = all-ones is deterministic and almost surely
    non-orthogonal to the top component.
    """
    from argodb_mapreduce_spark.functions.oracle_safe import gsum

    qv = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _quantize(F.col("embedding")).alias("qemb")
    )
    qf = float(_Q)

    # Product moments via blocked Gram accumulation: each Arrow batch
    # contributes one exact int64 Q^T Q (|q| <= 2^20 -> products <= 2^40,
    # 4096-row chunk sums <= 2^52 — far from int64 overflow), emitting
    # dims^2 partial rows per chunk instead of dims^2 rows PER VECTOR.
    # The old double-posexplode inflated the scan stage 64x (8.2M rows
    # at sf0.1, the whole query's cost); this is the blocked shape the
    # scale note below always called for. groupBy then decimal-sums the
    # integer partials exactly, so the covariance is bit-identical to
    # the per-cell oracle sums.
    def gram_blocks(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np.stack(pdf["qemb"].to_numpy()).astype(np.int64)
            for s in range(0, len(Q), 4096):
                c = Q[s : s + 4096]
                G = c.T @ c
                d = G.shape[0]
                ii, jj = np.indices((d, d))
                yield pd.DataFrame(
                    {
                        "i": ii.ravel().astype("int32"),
                        "j": jj.ravel().astype("int32"),
                        "sqq": G.ravel(),
                    }
                )

    sqq = (
        qv.select("qemb")
        .mapInPandas(gram_blocks, schema="i int, j int, sqq long")
        .groupBy("i", "j")
        .agg(F.sum(F.col("sqq").cast("decimal(38,0)")).cast("double").alias("sqq"))
    )
    # Marginal sums and the row count depend only on i — one cheap
    # single explode (dims rows per vector), not per-(i,j) replication.
    marg = (
        qv.select(F.posexplode("qemb").alias("i", "q"))
        .groupBy("i")
        .agg(F.sum(F.col("q").cast("decimal(38,0)")).cast("double").alias("s"))
    )
    nrow = qv.agg(F.count(F.lit(1)).cast("double").alias("n"))
    cov = (
        sqq.join(F.broadcast(marg.select("i", F.col("s").alias("sqi"))), "i")
        .join(F.broadcast(marg.select(F.col("i").alias("j"), F.col("s").alias("sqj"))), "j")
        .crossJoin(F.broadcast(nrow))
        .select(
            "i",
            "j",
            (
                (F.col("sqq") / F.col("n") - (F.col("sqi") / F.col("n")) * (F.col("sqj") / F.col("n")))
                / F.lit(qf)
                / F.lit(qf)
            ).alias("c"),
        )
        .localCheckpoint()
    )
    v = cov.select(F.col("i").alias("pos")).distinct().withColumn("v", F.lit(1.0))
    # Power iterations run over the CHECKPOINTED dims²-row covariance
    # (4096 rows, bounded by the embedding width, not by scale) — the
    # bounded-loop planner scope (AQE off, width 1; see tuning.py and
    # graph_pagerank) collapses what was one query-stage job per
    # Exchange into a single action; gsum grid sums keep the loadings
    # bit-identical at any partitioning, so the hash is unchanged.
    from argodb_mapreduce_spark.tuning import bounded_loop_conf, scoped_conf

    with scoped_conf(spark, bounded_loop_conf(width=1)):
        for _ in range(PCA_ITERS):
            w = (
                cov.join(v.select(F.col("pos").alias("j"), "v"), "j")
                .groupBy(F.col("i").alias("pos"))
                .agg(gsum(F.col("c") * F.col("v")).alias("w"))
            )
            nrm = w.agg(F.sqrt(gsum(F.col("w") * F.col("w"))).alias("nrm"))
            v = w.crossJoin(F.broadcast(nrm)).select(
                "pos", (F.col("w") / F.col("nrm")).alias("v")
            )
        v = v.localCheckpoint()
    return v.select("pos", F.col("v").alias("loading"))


SEMDEDUP_TAU = 0.40  #: FIXTURE within-cluster cosine threshold — matches
#: LSH_COS_THRESHOLD (similarity.py:435): the synthetic embeddings
#: have no true near-dups (max pairwise cos ~ 0.51), so a production
#: 0.95 (the SemDeDup paper's setting) would make every stage vacuous;
#: 0.40 keeps real work in the cluster -> pairwise -> keeper pipeline,
#: which is unchanged at 0.95. Production callers MUST pass their own
#: tau to dedup_semantic_clusters(..., tau=0.95) — do not copy this
#: fixture constant (ADVICE r7).


@register(
    "dedup_semantic_clusters",
    oracle=f"""
    WITH {_SQL_QUANT},
    withss AS (
        SELECT q.vec_id, a.cid, q.qe,
               CAST(list_sum(list_transform(range(1, len(q.qe) + 1),
                             i -> q.qe[i] * q.qe[i])) AS BIGINT) AS ss
        FROM q JOIN assigned a USING (vec_id)
    ),
    prs AS (
        SELECT x.cid, x.vec_id AS a_id, y.vec_id AS b_id,
               CAST(list_sum(list_transform(range(1, len(x.qe) + 1),
                             i -> x.qe[i] * y.qe[i])) AS BIGINT) AS dot,
               x.ss AS ssa, y.ss AS ssb
        FROM withss x JOIN withss y
          ON x.cid = y.cid AND x.vec_id < y.vec_id
    )
    SELECT b_id AS vec_id,
           CAST(cid AS BIGINT) AS centroid_id,
           MIN(a_id) AS kept_by,
           CAST(COUNT(*) AS BIGINT) AS n_similar
    FROM prs
    WHERE CAST(dot AS DOUBLE)
          / (sqrt(CAST(ssa AS DOUBLE)) * sqrt(CAST(ssb AS DOUBLE))) >= {SEMDEDUP_TAU}
    GROUP BY b_id, cid
    """,
    tags=("dedup", "clustering", "vector", "semantic"),
    doc=(
        f"SemDeDup-style semantic dedup: cluster embeddings with "
        f"k-means (deterministic {K_CLUSTERS}-centroid assignment), "
        f"then compare pairs ONLY within a cluster and drop every "
        f"vector with a cosine >= {SEMDEDUP_TAU} neighbour of lower id "
        f"(kept_by = its lowest such keeper). Clustering shrinks the "
        f"candidate space from O(n^2) to O(n^2/K) without bands or "
        f"hashes — the curation technique for pruning semantically "
        f"redundant training data, complementary to the LSH leg "
        f"(similarity_lsh_neardup) which catches cross-cluster dups."
    ),
)
def dedup_semantic_clusters(
    spark: SparkSession, sf_dir: str, tau: float = SEMDEDUP_TAU, k: int = K_CLUSTERS
) -> DataFrame:
    """Assignment is a broadcast argmin (vector table never shuffles);
    the pairwise stage shuffles once on cid and compares pairs inside
    clusters only. At 100 TB: K scales with corpus size to keep
    clusters bounded (SemDeDup uses ~100k clusters) — callers at scale
    pass k ∝ n (the registered fixture query keeps K_CLUSTERS so the
    oracle's literal matches); the per-cluster compare becomes the tiled
    cogrouped matmul already used by the IVF ops, and the keeper rule
    stays a per-pair min — no global state."""
    from argodb_mapreduce_spark.operators.similarity import _sq_norm

    e = _quantized(spark, sf_dir)
    cent = e.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("qe").alias("qc")
    )
    v = (
        e.join(
            assign_blocked(e, cent, table_rowcount(sf_dir, "embeddings")).select(
                "vec_id", "cid"
            ),
            "vec_id",
        )
        .select("vec_id", "cid", "qe", _sq_norm(F.col("qe")).alias("ss"))
    )
    # Per-cluster numpy matmul (the IVF score_cluster shape,
    # similarity.py:302) rather than a pairwise SQL self-join: Catalyst
    # pushes the cosine filter into the SortMergeJoin condition, where
    # it is evaluated interpreted for every ORDERED pair of the cid
    # group (measured 3.8 s via zip_with and 11.7 s via a flat
    # element_at sum at sf0.1); one dense integer matmul per cluster is
    # ~1000x less interpreter work and is exact — quantized components
    # stay below 2^22, so every float64 product and 64-term partial sum
    # is exactly representable and the doubles equal the SQL oracle's
    # bit-for-bit. The keeper rule is cluster-local, so the UDF emits
    # final rows and nothing shuffles afterwards.
    def prune_cluster(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "vec_id": pd.Series(dtype="int64"),
                "centroid_id": pd.Series(dtype="int64"),
                "kept_by": pd.Series(dtype="int64"),
                "n_similar": pd.Series(dtype="int64"),
            }
        )
        if len(pdf) < 2:
            return empty
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        Q = np.stack(pdf["qe"].to_numpy()).astype("int64")
        ss = pdf["ss"].to_numpy().astype("float64")
        # float64 matmul is bit-exact vs the SQL oracle only when every
        # product (< 2^44) AND every dim-term partial sum stays below
        # 2^53: |component| < 2^22 and dim <= 512 => sum < 2^53
        # (ADVICE r7: magnitude alone is insufficient for wide vectors).
        if np.abs(Q).max(initial=0) < (1 << 22) and Q.shape[1] <= 512:
            D = Q.astype("float64") @ Q.astype("float64").T
        else:  # pragma: no cover - fixture is 64-dim, grid < 2^22
            D = (Q @ Q.T).astype("float64")
        C = D / (np.sqrt(ss)[:, None] * np.sqrt(ss)[None, :])
        cid = int(pdf["cid"].iloc[0])
        out_v, out_k, out_n = [], [], []
        for j in range(1, len(ids)):
            mask = C[j, :j] >= tau
            if mask.any():
                out_v.append(int(ids[j]))
                out_k.append(int(ids[:j][mask].min()))
                out_n.append(int(mask.sum()))
        return pd.DataFrame(
            {
                "vec_id": out_v,
                "centroid_id": [cid] * len(out_v),
                "kept_by": out_k,
                "n_similar": out_n,
            }
        )

    return v.groupBy("cid").applyInPandas(
        prune_cluster,
        schema="vec_id long, centroid_id long, kept_by long, n_similar long",
    )
