"""Similarity search over embeddings (SURVEY.md §2.C3).

Exact cosine top-k as the baseline and an IVF-style partitioned ANN as
the scale path — both pure DataFrame pipelines (array fold for the dot
product inside whole-stage codegen; no Python in the hot path), and
both fully DuckDB-oracle-checked.

Determinism (and a real production trick): vectors are quantized to
integers — q = round(x · 2^20), where x · 2^20 is an *exact* double
(power-of-two scaling) so the rounding is engine-independent. Dot
products and norms are then pure 64-bit integer arithmetic (64 dims ×
24-bit components < 2^63): exact, summation-order-free, identical in
any engine. Only the final cos = dot / (sqrt(na)·sqrt(nb)) is IEEE
double — int→double conversion is correctly rounded, sqrt is correctly
rounded, so the cosine doubles are bit-identical between Spark and
DuckDB and even rank ties break the same. Quantization error (~1e-6 on
unit-scale data) is far below any similarity threshold in use.

At 100 TB the exact path is O(n²) and exists as the correctness
baseline + LSH/IVF verify step; the IVF path is the production shape:
assignment is a broadcast join against the (small) centroid set, and
search touches only the probed clusters — at cluster scale the
candidate join is a shuffle on cluster_id, prunable by partitioning
the vector table by cluster_id (the standard IVF layout).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from argodb_mapreduce_spark.catalog import load_table, table_rowcount
from argodb_mapreduce_spark.functions.oracle_safe import gavg, sql_gavg
from argodb_mapreduce_spark.registry import register

TOP_K = 5
N_CENTROIDS = 16
N_PROBES = 6  # measured mean recall@5 ≈ 0.63 at sf0.001 with fixed seed centroids
_Q = 1 << 20  # quantization scale: round(x * 2^20) is exact + engine-independent


def _quantize(a: Column) -> Column:
    """array<float> → array<long> on the exact 2^-20 grid."""
    return F.transform(a, lambda x: F.round(x.cast("double") * F.lit(float(_Q))).cast("long"))


def _dot(qa: Column, qb: Column) -> Column:
    """Exact integer dot product of two quantized vectors (expression
    form — fine for small pair counts like centroid assignment; the
    all-pairs paths use the blocked numpy matmul below instead)."""
    prods = F.zip_with(qa, qb, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, x: acc + x)


# Blocked-matmul fast path (inside the pandas UDFs below): with
# |q| < 2^22, products are < 2^44 and 64-term partial sums < 2^50 —
# every intermediate is an integer below 2^53, so float64 BLAS matmul
# is exact in ANY summation order; above the guard the UDFs fall back
# to int64 matmul, still exact.


def _sq_norm(qa: Column) -> Column:
    return _dot(qa, qa)


def _cosine(dot: Column, ssa: Column, ssb: Column) -> Column:
    return dot.cast("double") / (F.sqrt(ssa.cast("double")) * F.sqrt(ssb.cast("double")))


# DuckDB twins. z[1]/z[2] index the unnamed list_zip struct. SUM(BIGINT)
# is HUGEINT in DuckDB — cast back to BIGINT (no overflow: 64 dims ×
# 24-bit quantized components stay < 2^63).
_SQL_NORMS = f"""
  SELECT vec_id,
         list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * {float(_Q)}) AS BIGINT)) AS qemb
  FROM embeddings
"""
_SQL_WITH_SS = """
  SELECT vec_id, qemb,
         (SELECT CAST(SUM(x * x) AS BIGINT) FROM UNNEST(qemb) AS u(x)) AS ss
  FROM qv
"""


def _sql_cos(ea: str, eb: str, ssa: str, ssb: str) -> str:
    return (
        f"CAST((SELECT CAST(SUM(z[1] * z[2]) AS BIGINT) FROM UNNEST(list_zip({ea}, {eb})) AS t(z)) AS DOUBLE)"
        f" / (SQRT(CAST({ssa} AS DOUBLE)) * SQRT(CAST({ssb} AS DOUBLE)))"
    )


@register(
    "similarity_cosine_topk",
    oracle=f"""
    WITH qv AS ({_SQL_NORMS}),
    v AS ({_SQL_WITH_SS}),
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             CAST({_sql_cos("a.qemb", "b.qemb", "a.ss", "b.ss")} AS DOUBLE) AS cos_sim
      FROM v a JOIN v b ON a.vec_id <> b.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rn AS INT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rn
      FROM scored
    ) WHERE rn <= {TOP_K}
    """,
    tags=("similarity", "vector"),
    doc=(
        f"Exact brute-force cosine top-{TOP_K}: self-join + array-fold dot "
        "product + window top-k. The correctness baseline for the ANN path."
    ),
)
def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-nested-loop all-pairs: vectors are grouped into blocks, block
    pairs cross-join (tiny rows), and each block×block dot matrix is one
    exact numpy matmul inside mapInPandas — ~20× faster than a per-pair
    expression fold, and the shape that scales (block pairs partition
    evenly across executors; Arrow moves O(n·d) per block, not O(n²·d))."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _quantize(F.col("embedding")).alias("qemb")
    )
    # Planning-time size from parquet footer metadata (no Spark job runs
    # until the returned DataFrame is acted on — VERDICT r1 finding 6).
    return _exact_cosine_topk(e, table_rowcount(sf_dir, "embeddings"))


def _exact_cosine_topk(e: DataFrame, n: int) -> DataFrame:
    """The block-nested-loop exact top-k over a (vec_id, qemb) frame —
    shared by the plaintext baseline and the encrypted-store variant
    (same scoring, different source)."""
    e = e.select("vec_id", "qemb", _sq_norm(F.col("qemb")).alias("ss"))
    n_blocks = max(1, (n + 511) // 512)
    blocks = (
        e.withColumn("blk", F.pmod(F.col("vec_id"), F.lit(n_blocks)))
        .groupBy("blk")
        .agg(F.collect_list(F.struct("vec_id", "qemb", "ss")).alias("vs"))
    )
    bp = blocks.select(F.col("blk").alias("blk_a"), F.col("vs").alias("vs_a")).crossJoin(
        blocks.select(F.col("blk").alias("blk_b"), F.col("vs").alias("vs_b"))
    )
    top_k = TOP_K

    def run(batches):  # nested: pickled by value (executors lack this repo)
        import numpy as np
        import pandas as pd

        blas_safe = 1 << 22

        for pdf in batches:
            for vs_a, vs_b in zip(pdf["vs_a"], pdf["vs_b"]):
                ids_a = np.array([r["vec_id"] for r in vs_a])
                ids_b = np.array([r["vec_id"] for r in vs_b])
                A = np.stack([r["qemb"] for r in vs_a]).astype("int64")
                B = np.stack([r["qemb"] for r in vs_b]).astype("int64")
                ss_a = np.array([r["ss"] for r in vs_a], dtype="int64")
                ss_b = np.array([r["ss"] for r in vs_b], dtype="int64")
                if max(np.abs(A).max(initial=0), np.abs(B).max(initial=0)) < blas_safe:
                    D = (A.astype("float64") @ B.astype("float64").T).astype("int64")
                else:
                    D = A @ B.T
                # cos in float64: exact int conversions (< 2^53), hardware
                # sqrt/div — bit-identical to the engine/oracle expression.
                C = D.astype("float64") / (np.sqrt(ss_a.astype("float64"))[:, None] * np.sqrt(ss_b.astype("float64"))[None, :])
                qids, nids, coss = [], [], []
                for i in range(len(ids_a)):
                    row = C[i]
                    valid = ids_b != ids_a[i]
                    # local top-k by (cos desc, neighbor asc): the global
                    # top-k is a subset of the union of local top-ks.
                    order = np.lexsort((ids_b[valid], -row[valid]))[:top_k]
                    sel_ids = ids_b[valid][order]
                    sel_cos = row[valid][order]
                    qids.extend([ids_a[i]] * len(sel_ids))
                    nids.extend(sel_ids)
                    coss.extend(sel_cos)
                yield pd.DataFrame({"query_id": qids, "neighbor_id": nids, "cos_sim": coss})

    local_top = bp.mapInPandas(run, schema="query_id long, neighbor_id long, cos_sim double")
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return local_top.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= TOP_K)


#: Planted near-duplicate ids (VERDICT r13 #7): the synthetic embeddings
#: fixture has NO true near-dups (max pairwise cos ≈ 0.51), so the
#: threshold query used to pass vacuously at 0 == 0 rows. The query (and
#: its oracle) union in two DETERMINISTIC vectors derived from vec_id 0
#: at the quantized-integer level — an exact copy and a one-component
#: +1000 perturbation — pinning a non-empty positive path: (0, A) at
#: cos exactly 1.0 and two genuine near-dup pairs just below it.
_PLANT_A, _PLANT_B = 1_000_000, 1_000_001


@register(
    "similarity_embedding_neardup",
    oracle=f"""
    WITH qv0 AS ({_SQL_NORMS}),
    planted AS (
      SELECT CAST({_PLANT_A} AS BIGINT) AS vec_id, qemb FROM qv0 WHERE vec_id = 0
      UNION ALL
      SELECT CAST({_PLANT_B} AS BIGINT) AS vec_id,
             list_concat([qemb[1] + 1000], qemb[2:]) AS qemb
      FROM qv0 WHERE vec_id = 0
    ),
    qv AS (SELECT * FROM qv0 UNION ALL SELECT * FROM planted),
    v AS ({_SQL_WITH_SS})
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           CAST({_sql_cos("a.qemb", "b.qemb", "a.ss", "b.ss")} AS DOUBLE) AS cos_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE {_sql_cos("a.qemb", "b.qemb", "a.ss", "b.ss")} >= 0.95
    """,
    tags=("similarity", "dedup", "vector"),
    doc=(
        "Embedding-cosine near-duplicate pairs (cos >= 0.95) — the "
        "embedding leg of the dedup suite (SURVEY.md §2.C2), with a "
        "deterministic planted near-dup pair so the oracle pins a "
        "non-empty answer."
    ),
)
def similarity_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _quantize(F.col("embedding")).alias("qemb")
    )
    seed = q.filter(F.col("vec_id") == 0)
    plant_a = seed.select(
        F.lit(_PLANT_A).cast("long").alias("vec_id"), F.col("qemb")
    )
    plant_b = seed.select(
        F.lit(_PLANT_B).cast("long").alias("vec_id"),
        F.concat(
            F.array(F.element_at("qemb", 1) + F.lit(1000).cast("long")),
            F.slice("qemb", 2, F.size("qemb") - 1),
        ).alias("qemb"),
    )
    e = q.unionAll(plant_a).unionAll(plant_b)
    e = e.select("vec_id", "qemb", _sq_norm(F.col("qemb")).alias("ss"))
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
            _cosine(_dot(F.col("a.qemb"), F.col("b.qemb")), F.col("a.ss"), F.col("b.ss")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.95)
    )


@register(
    "similarity_encrypted_topk",
    oracle=f"""
    WITH qv AS ({_SQL_NORMS}),
    v AS ({_SQL_WITH_SS}),
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             CAST({_sql_cos("a.qemb", "b.qemb", "a.ss", "b.ss")} AS DOUBLE) AS cos_sim
      FROM v a JOIN v b ON a.vec_id <> b.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rn AS INT) AS rank,
           TRUE AS keyless_vector_refused
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rn
      FROM scored
    ) WHERE rn <= {TOP_K}
    """,
    tags=("similarity", "vector", "encryption"),
    doc=(
        f"ANN over an ENCRYPTED vector store (r14): the embeddings land "
        "in a COLUMN-encrypted versioned table (vec_id plaintext, the "
        "vector column AES-GCM-encrypted — nested leaves under per-leaf "
        "column keys), and the exact cosine top-{TOP_K} runs on the "
        "keyed scan with results bit-identical to the plaintext "
        "baseline. Pinned: keyless projection of the vector column is "
        "refused at plan time, while the plaintext id column stays "
        "keyless-readable — embeddings are exactly the derived "
        "sensitive data (memorization/inversion risk) a training "
        "pipeline encrypts at rest."
    ),
)
def similarity_encrypted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the keyed scan is one task per encrypted file with AES-GCM
    at memory bandwidth; scoring reuses the block-matmul exact top-k
    (O(n·d) Arrow traffic per block, even block-pair partitioning) —
    the cipher adds a scan-side constant, nothing to the join shape."""
    import os
    import shutil
    import tempfile

    from argodb_mapreduce_spark.catalog import fixture_stale, table_path
    from argodb_mapreduce_spark.sources.python_datasource import (
        FORMAT_NAME,
        register_datasource,
    )
    from argodb_mapreduce_spark.sources.versioned import (
        MANIFEST,
        snapshot_read,
        versions,
    )

    register_datasource(spark)
    import base64

    key = base64.b64encode(bytes(range(32))).decode()
    tag = sf_dir.strip("/").replace("/", "_")
    out = os.path.join(
        tempfile.gettempdir(), "argodb_mapreduce_spark", tag, "enc_vectors"
    )
    # Read-only encrypted store: stage once per source fixture
    # (mtime-keyed, the same contract every derived layout uses); the
    # keyed scan + exact top-k below are the declared computation and
    # run per invocation.
    src = table_path(sf_dir, "embeddings")
    if fixture_stale(src, os.path.join(out, MANIFEST)) or versions(out) != [
        0
    ]:
        shutil.rmtree(out, ignore_errors=True)
        (
            load_table(spark, sf_dir, "embeddings")
            .select("vec_id", _quantize(F.col("embedding")).alias("qemb"))
            .write.format(FORMAT_NAME)
            .option("encryptionKey", key)
            .option("encryptColumns", "qemb")
            .mode("append")
            .save(out)
        )
    keyless_refused = False
    try:
        snapshot_read(spark, out, columns=["vec_id", "qemb"])
    except ValueError as e:
        # ...while the plaintext id column reads keyless
        keyless_refused = (
            "ENCRYPTED" in str(e)
            and snapshot_read(spark, out, columns=["vec_id"]).columns
            == ["vec_id"]
        )
    e = snapshot_read(spark, out, encryption_key=key).select(
        "vec_id", "qemb"
    )
    n = table_rowcount(sf_dir, "embeddings")
    return _exact_cosine_topk(e, n).withColumn(
        "keyless_vector_refused", F.lit(keyless_refused)
    )


def _centroids(e: DataFrame) -> DataFrame:
    """Deterministic centroid set: the first N_CENTROIDS vectors by id.

    A production IVF trains k-means; a fixed deterministic seed set keeps
    the op oracle-checkable while exercising the same dataflow shape.
    """
    return (
        e.filter(F.col("vec_id") < N_CENTROIDS)
        .select(F.col("vec_id").alias("cid"), F.col("qemb").alias("cemb"), F.col("ss").alias("css"))
    )


_SQL_CENT = f"SELECT vec_id AS cid, qemb AS cemb, ss AS css FROM v WHERE vec_id < {N_CENTROIDS}"

_SQL_IVF = f"""
    WITH qv AS ({_SQL_NORMS}),
    v AS ({_SQL_WITH_SS}),
    cent AS ({_SQL_CENT}),
    vc AS (
      SELECT v.vec_id, v.qemb, v.ss, cent.cid,
             CAST({_sql_cos("v.qemb", "cent.cemb", "v.ss", "cent.css")} AS DOUBLE) AS ccos
      FROM v CROSS JOIN cent
    ),
    asg AS (
      SELECT vec_id, qemb, ss, cid FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM vc
      ) WHERE rn = 1
    ),
    probe AS (
      SELECT vec_id AS query_id, cid FROM (
        SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn FROM vc
      ) WHERE rn <= {N_PROBES}
    ),
    cand AS (
      SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
      FROM probe p JOIN asg a ON a.cid = p.cid AND a.vec_id <> p.query_id
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id,
             CAST({_sql_cos("q.qemb", "n.qemb", "q.ss", "n.ss")} AS DOUBLE) AS cos_sim
      FROM cand c JOIN v q ON q.vec_id = c.query_id JOIN v n ON n.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rn AS INT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rn
      FROM scored
    ) WHERE rn <= {TOP_K}
"""


@register(
    "similarity_ivf_topk",
    oracle=_SQL_IVF,
    tags=("similarity", "vector", "ann"),
    doc=(
        f"IVF-style ANN: assign every vector to its nearest of {N_CENTROIDS} "
        f"deterministic centroids, probe the {N_PROBES} nearest centroid "
        f"lists per query, exact-rescore candidates, top-{TOP_K}. Search cost "
        "drops from O(n²) to O(n·n/k·probes) — the scale path, and still "
        "fully oracle-checked because every step is deterministic."
    ),
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _quantize(F.col("embedding")).alias("qemb")
    )
    e = e.select("vec_id", "qemb", _sq_norm(F.col("qemb")).alias("ss"))
    cent = _centroids(e)
    vc = e.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "qemb",
        "ss",
        "cid",
        _cosine(_dot(F.col("qemb"), F.col("cemb")), F.col("ss"), F.col("css")).alias("ccos"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cid").asc())
    ranked = vc.withColumn("rn", F.row_number().over(w_assign))
    # Inverted lists: members of each centroid's cluster. Renamed columns
    # break the shared lineage with `probes` (ambiguous-self-join check).
    members = ranked.filter(F.col("rn") == 1).select(
        F.col("cid").alias("mcid"),
        F.col("vec_id").alias("neighbor_id"),
        F.col("qemb").alias("memb"),
        F.col("ss").alias("mss"),
    )
    # Probe set: each query visits its N_PROBES nearest inverted lists.
    probes = ranked.filter(F.col("rn") <= N_PROBES).select(
        "cid", F.col("vec_id").alias("query_id"), "qemb", "ss"
    )

    # Score one inverted list against everything probing it with a single
    # exact matmul per cluster (cogrouped applyInPandas) — the IVF-native
    # dataflow: shuffle keyed by cluster id, compute dense per cluster.
    top_k = TOP_K

    def score_cluster(probe_pdf, member_pdf):
        import numpy as np
        import pandas as pd

        blas_safe = 1 << 22
        empty = pd.DataFrame({"query_id": pd.Series(dtype="int64"), "neighbor_id": pd.Series(dtype="int64"), "cos_sim": pd.Series(dtype="float64")})

        if probe_pdf.empty or member_pdf.empty:
            return empty
        Q = np.stack(probe_pdf["qemb"].to_numpy()).astype("int64")
        M = np.stack(member_pdf["memb"].to_numpy()).astype("int64")
        if max(np.abs(Q).max(initial=0), np.abs(M).max(initial=0)) < blas_safe:
            D = (Q.astype("float64") @ M.astype("float64").T).astype("int64")
        else:
            D = Q @ M.T
        q_ids = probe_pdf["query_id"].to_numpy()
        m_ids = member_pdf["neighbor_id"].to_numpy()
        ss_q = probe_pdf["ss"].to_numpy().astype("float64")
        ss_m = member_pdf["mss"].to_numpy().astype("float64")
        C = D.astype("float64") / (np.sqrt(ss_q)[:, None] * np.sqrt(ss_m)[None, :])
        qids, nids, coss = [], [], []
        for i in range(len(q_ids)):
            valid = m_ids != q_ids[i]
            order = np.lexsort((m_ids[valid], -C[i][valid]))[:top_k]
            sel = m_ids[valid][order]
            qids.extend([q_ids[i]] * len(sel))
            nids.extend(sel)
            coss.extend(C[i][valid][order])
        return pd.DataFrame({"query_id": qids, "neighbor_id": nids, "cos_sim": coss})

    local_top = (
        probes.groupBy("cid")
        .cogroup(members.groupBy("mcid"))
        .applyInPandas(score_cluster, schema="query_id long, neighbor_id long, cos_sim double")
        # a (query, neighbor) pair can meet in several probed clusters —
        # dedup before ranking (cos values are identical by exactness).
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cos_sim").alias("cos_sim"))
    )
    w_top = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return local_top.withColumn("rank", F.row_number().over(w_top)).filter(F.col("rank") <= TOP_K)


@register(
    "similarity_ivf_recall",
    oracle="SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS recall_ok FROM embeddings",
    tags=("similarity", "vector", "ann", "selfcheck"),
    doc=(
        "Self-validation of the IVF path: mean recall@5 vs the exact "
        "top-5, asserted >= 0.5 in the recall_ok column. Only the "
        "deterministic query count and the pass flag are emitted (the "
        "mean recall itself is engine-internal), so the contract row is "
        "hash-checkable; tests assert the recall value — SURVEY.md §5.3."
    ),
)
def similarity_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivf_recall_detail(spark, sf_dir).select("n_queries", "recall_ok")


def ivf_recall_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full recall diagnostics (n_queries, mean_recall, recall_ok) — used
    by tests; the registered query exposes only the hashable contract."""
    exact = similarity_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    approx = similarity_ivf_topk(spark, sf_dir).select("query_id", "neighbor_id")
    hits = exact.join(approx, ["query_id", "neighbor_id"]).groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit"))
    per_query = (
        exact.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .join(hits, "query_id", "left")
        .select("query_id", (F.coalesce("n_hit", F.lit(0)) / F.col("n_exact")).alias("recall"))
    )
    return per_query.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.avg("recall").alias("mean_recall"),
        (F.avg("recall") >= 0.5).alias("recall_ok"),
    )


@register(
    "embedding_centroid_per_label",
    oracle=f"""
    SELECT CAST(label AS INT) AS label,
           CAST(i AS INT) AS pos,
           CAST(SUM(CAST(ROUND(CAST(embedding[i + 1] AS DOUBLE) * {float(_Q)}) AS BIGINT)) AS DOUBLE)
             / (COUNT(*) * {float(_Q)}) AS centroid,
           CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM embeddings, UNNEST(range(0, len(embedding))) AS u(i)
    GROUP BY label, i
    """,
    tags=("similarity", "vector", "agg"),
    doc=(
        "Per-class mean embedding (centroid): the vector aggregate behind "
        "class prototypes, clustering init, and embedding-drift monitoring. "
        "posexplode to (label, pos, component) then a plain long-sum "
        "group-by — partial aggregation map-side, shuffle volume O(labels "
        "x dims), never O(vectors); components are 2^20-quantized so the "
        "integer sums (< 2^53) and the final division are bit-identical "
        "in both engines."
    ),
)
def embedding_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    exploded = e.select(
        F.col("label").cast("int").alias("label"),
        F.posexplode(_quantize(F.col("embedding"))).alias("pos", "q"),
    )
    return exploded.groupBy("label", "pos").agg(
        (F.sum("q").cast("double") / (F.count(F.lit(1)) * F.lit(float(_Q)))).alias("centroid"),
        F.count(F.lit(1)).alias("n_vectors"),
    )


# ---------------------------------------------------------------------------
# C2/C3 — Random-hyperplane LSH (SimHash for embeddings): the scale path
# for embedding near-dup. similarity_embedding_neardup above is the O(n²)
# correctness baseline; this is the shape that survives 100 TB: signatures
# are a per-row map (no shuffle), candidate generation shuffles only on
# (band, bucket) keys, and the exact-cosine verify touches candidate
# pairs, not all pairs. Hyperplane components are ±1 derived from md5 at
# module import — deterministic, so the DuckDB oracle replicates the
# exact same planes as SQL literals.
# ---------------------------------------------------------------------------

N_PLANES = 16
LSH_BAND_BITS = 4
LSH_N_BANDS = N_PLANES // LSH_BAND_BITS
EMB_DIMS = 64
#: The synthetic embeddings fixture has no true near-dups (max pairwise
#: cos ~ 0.51 at every SF), so a production 0.95 threshold would make the
#: verify stage vacuous. 0.40 keeps the identical pipeline (signature →
#: band buckets → candidate join → exact-cosine verify) with real work in
#: every stage; a production corpus runs the same operator at 0.95, where
#: per-bit agreement is higher and candidate volume far lower.
LSH_COS_THRESHOLD = 0.40


def _hyperplanes() -> list[list[int]]:
    import hashlib

    planes = []
    for p in range(N_PLANES):
        row = []
        for i in range(EMB_DIMS):
            digest = hashlib.md5(f"plane-{p}-dim-{i}".encode()).digest()
            row.append(1 if digest[0] & 1 else -1)
        planes.append(row)
    return planes


_PLANES = _hyperplanes()

_BANDS_EXPR: str | None = None


def _bands_expr() -> str:
    """SQL text for the full LSH band-value array over column ``qemb``.

    The +/-1 hyperplanes make each projection a flat signed sum of
    element_at terms, so the whole 16-bit signature is one SQL string
    (built once per process, parsed once per query): no per-literal
    py4j traffic at DataFrame-construction time and no interpreted
    higher-order-function lambdas at execution time — the flat sums
    compile into whole-stage codegen. Profiled at sf0.1: the previous
    zip_with/aggregate-per-plane build spent ~0.9 s of driver time
    constructing 1024 F.lit nodes and ~0.2 s/row-batch interpreting
    lambdas; this form cut similarity_lsh_neardup from 2.2 s to
    ~1.3 s wall (VERDICT r6 next-step 4).
    """
    global _BANDS_EXPR
    if _BANDS_EXPR is None:
        def bit(p: int) -> str:
            terms = " ".join(
                f"{'+' if v > 0 else '-'} element_at(qemb, {i + 1})"
                for i, v in enumerate(_PLANES[p])
            )
            return f"(CAST(({terms}) >= 0 AS INT))"

        def band(b: int) -> str:
            bits = " + ".join(
                f"({bit(b * LSH_BAND_BITS + j)} * {1 << j})"
                for j in range(LSH_BAND_BITS)
            )
            return f"CAST(({bits}) AS INT)"

        _BANDS_EXPR = "array(" + ", ".join(band(b) for b in range(LSH_N_BANDS)) + ")"
    return _BANDS_EXPR


def _sql_plane_lit(p: int) -> str:
    return "[" + ", ".join(str(v) for v in _PLANES[p]) + "]"


def _sql_bit(p: int) -> str:
    """1/0: is the quantized vector on the positive side of plane p? The
    projection is an exact integer sum (|q| < 2^24, 64 terms), so the
    sign — the only thing used — is engine-independent."""
    return (
        f"CAST((SELECT SUM(z[1] * z[2]) FROM UNNEST(list_zip(qemb, {_sql_plane_lit(p)})) AS t(z)) >= 0 AS INT)"
    )


def _sql_band_val(b: int) -> str:
    bits = [f"({_sql_bit(b * LSH_BAND_BITS + j)} * {1 << j})" for j in range(LSH_BAND_BITS)]
    return " + ".join(bits)


_SQL_LSH_SIG = "SELECT vec_id, qemb, ss, " + ", ".join(
    f"CAST({_sql_band_val(b)} AS INT) AS band{b}" for b in range(LSH_N_BANDS)
) + " FROM v"

_SQL_LSH_BUCKETS = (
    "SELECT vec_id, b AS band_id, CASE b "
    + " ".join(f"WHEN {b} THEN band{b}" for b in range(LSH_N_BANDS))
    + " END AS val FROM sig, UNNEST(["
    + ", ".join(str(b) for b in range(LSH_N_BANDS))
    + "]) AS u(b)"
)


#: Shared CTE chain ending in ``pairs`` (verified LSH near-dup pairs) —
#: used by the pairs oracle and the connected-components oracle below.
_SQL_LSH_PAIR_CTES = f"""qv AS ({_SQL_NORMS}),
    v AS ({_SQL_WITH_SS}),
    sig AS ({_SQL_LSH_SIG}),
    buckets AS ({_SQL_LSH_BUCKETS}),
    cand AS (
      SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
      FROM buckets a JOIN buckets b
        ON a.band_id = b.band_id AND a.val = b.val AND a.vec_id < b.vec_id
    ),
    pairs AS (
      SELECT cand.a_id, cand.b_id,
             CAST({_sql_cos("va.qemb", "vb.qemb", "va.ss", "vb.ss")} AS DOUBLE) AS cos_sim
      FROM cand
      JOIN v va ON va.vec_id = cand.a_id
      JOIN v vb ON vb.vec_id = cand.b_id
      WHERE {_sql_cos("va.qemb", "vb.qemb", "va.ss", "vb.ss")} >= {LSH_COS_THRESHOLD}
    )"""


def make_bucket_scorer(threshold: float, chunk: int = 2048):
    """Build the in-bucket pair scorer: every pair >= ``threshold``,
    walking the upper triangle in ``chunk`` x ``chunk`` tiles. Band-bit
    count bounds DISTINCT signatures per band, not bucket SIZE — a
    duplicate-heavy corpus puts every copy in one bucket, so B can be
    corpus-scale; tiling caps worker memory at ~chunk^2 floats (32 MB
    at 2048) regardless of B, the same blocked shape
    similarity_cosine_topk uses. Arithmetic per pair is unchanged vs
    the full B x B matmul, so results stay bit-identical (unit-tested
    with a tiny chunk in tests/test_round5_fixes.py).

    MIN-BAND FILTER: a pair colliding in k bands lands in k buckets; if
    the input carries the full per-vector band-value array (``bands``
    column) plus the grouping ``band_id``, the scorer emits a pair ONLY
    from its first (lowest-id) colliding band — any pair whose band
    arrays also agree on an earlier band is someone else's to emit. The
    output is then exactly one row per verified pair, so the consumer
    needs no distinct() (which was a full shuffle of k copies of every
    pair). The check runs only on pairs that already passed the
    threshold (O(survivors x band_id) integer compares), not on the
    n^2 tile. Without the ``bands``/``band_id`` columns the scorer
    keeps the old emit-every-collision behavior (deduped downstream).

    Factory-closure so cloudpickle ships the scorer BY VALUE — the
    driver contract runs executors that cannot import this repo (same
    pattern as sources/python_datasource.make_versioned_datasource)."""

    def verify_bucket(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame({
            "a_id": pd.Series(dtype="int64"),
            "b_id": pd.Series(dtype="int64"),
            "cos_sim": pd.Series(dtype="float64"),
        })
        if len(pdf) < 2:
            return empty
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        Q = np.stack(pdf["qemb"].to_numpy()).astype(np.float64)
        root = np.sqrt(pdf["ss"].to_numpy().astype(np.float64))
        band_id = int(pdf["band_id"].iloc[0]) if "band_id" in pdf.columns else 0
        # Earlier-band signature matrix, only needed past band 0.
        Bprev = (
            np.stack(pdf["bands"].to_numpy()).astype(np.int64)[:, :band_id]
            if band_id > 0 and "bands" in pdf.columns
            else None
        )
        n = len(ids)
        out = []
        for i0 in range(0, n, chunk):
            i1 = min(i0 + chunk, n)
            for j0 in range(i0, n, chunk):
                j1 = min(j0 + chunk, n)
                # exact: products < 2^44, 64-term sums < 2^50
                cos = (Q[i0:i1] @ Q[j0:j1].T) / (root[i0:i1, None] * root[None, j0:j1])
                ii, jj = np.nonzero(cos >= threshold)
                gi, gj = ii + i0, jj + j0
                keep = gi < gj  # ids sorted => a_id < b_id; drops diag/lower
                if keep.any() and Bprev is not None:
                    # min-band: drop pairs that also collide in an
                    # earlier band (that band's bucket emits them).
                    keep[keep] = ~(Bprev[gi[keep]] == Bprev[gj[keep]]).any(axis=1)
                if keep.any():
                    out.append(pd.DataFrame({
                        "a_id": ids[gi[keep]],
                        "b_id": ids[gj[keep]],
                        "cos_sim": cos[ii[keep], jj[keep]],
                    }))
        if not out:
            return empty
        return pd.concat(out, ignore_index=True)

    return verify_bucket


@register(
    "similarity_lsh_neardup",
    oracle=f"""
    WITH {_SQL_LSH_PAIR_CTES}
    SELECT a_id, b_id, cos_sim FROM pairs
    """,
    tags=("similarity", "dedup", "vector", "lsh"),
    doc=(
        f"Embedding near-dup via random-hyperplane LSH: {N_PLANES}-bit "
        f"signed-projection signature, {LSH_N_BANDS} bands x "
        f"{LSH_BAND_BITS} bits, bucket-join candidates, exact integer-"
        f"cosine verify at {LSH_COS_THRESHOLD} (fixture-tuned; see the "
        "LSH_COS_THRESHOLD note). The scale path for "
        "similarity_embedding_neardup (same output contract, candidates "
        "instead of all pairs): signature is a per-row map, the only "
        "shuffles are the (band, bucket) candidate join and the verify "
        "join-back. Per-bit agreement is 1 - theta/pi; recall is traded "
        "against candidate volume by BAND_BITS exactly as in the MinHash "
        "LSH operator (operators/dedup.py)."
    ),
)
def similarity_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Verify INSIDE each (band, bucket) group: every vector ships into
    # Python exactly once per band (|buckets| rows x 64 longs — MBs),
    # and the within-bucket all-pairs cosine is one exact numpy matmul
    # (integer values < 2^53, see the blocked-matmul note above), rather
    # than joining the full qemb arrays onto every candidate pair and
    # folding a 64-term HOF per pair (that shape moved ~1000x more bytes
    # through the verify join and was the slowest headline query). A
    # pair colliding in k bands lands in k buckets, but the min-band
    # filter emits it only from its first colliding band, so output
    # pairs are unique without a distinct() shuffle. Hot buckets are
    # bounded by the band-bit count exactly as in the MinHash operator;
    # the shuffle key is (band_id, val) — the same layout the candidate
    # join needed anyway.
    # Each row carries its FULL band array: the scorer's min-band filter
    # (see make_bucket_scorer) emits a pair only from its first
    # colliding band, so the output is distinct by construction — no
    # k-copies-per-pair shuffle and no redundant re-emission. The band
    # signature is ONE pre-built SQL expression of flat element_at
    # sums (_bands_expr): the earlier per-plane formulation built 16
    # plane arrays from 1024 F.lit py4j calls (~0.9 s of driver time
    # per invocation) and evaluated 16 interpreted zip_with/aggregate
    # lambdas per row; the flat +/- sums parse once, constant-fold,
    # and stay inside whole-stage codegen. qemb ships as int32
    # (|q| <= 2^20 on the quantization grid, and each vector crosses
    # the bucket shuffle + Arrow boundary once per band) — the
    # scorer's float64 upcast sees identical values.
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _quantize(F.col("embedding")).alias("qemb")
    )
    sig = e.select(
        "vec_id", "qemb", _sq_norm(F.col("qemb")).alias("ss"),
        F.expr(_bands_expr()).alias("bands"),
    ).select(
        "vec_id", F.col("qemb").cast("array<int>").alias("qemb"), "ss", "bands",
        F.posexplode("bands").alias("band_id", "val"),
    )

    return sig.groupBy("band_id", "val").applyInPandas(
        make_bucket_scorer(LSH_COS_THRESHOLD),
        schema="a_id long, b_id long, cos_sim double",
    )


@register(
    "similarity_embedding_clusters",
    oracle=f"""
    WITH RECURSIVE {_SQL_LSH_PAIR_CTES},
    edges AS (
      SELECT a_id AS a, b_id AS b FROM pairs
      UNION
      SELECT b_id AS a, a_id AS b FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT emb.vec_id,
           LEAST(emb.vec_id, COALESCE(MIN(r.b), emb.vec_id)) AS cluster_id
    FROM embeddings emb LEFT JOIN reach r ON r.a = emb.vec_id
    GROUP BY emb.vec_id
    """,
    tags=("similarity", "dedup", "vector", "iterative"),
    doc=(
        "Embedding near-dup CLUSTERS: connected components over the "
        "verified LSH pairs via the same iterative min-label propagation "
        "as dedup_minhash_clusters (cluster_id = min vec_id in the "
        "component; singletons label themselves). Completes the "
        "embedding-dedup pipeline: signature -> buckets -> in-bucket "
        "verify -> transitive closure -> join back to keep one "
        "representative per cluster. The oracle is a recursive-CTE "
        "transitive closure, so the iterative op is hash-checked. Scale: "
        "edges are the verified near-dup pairs (tiny vs the corpus at a "
        "production threshold); each round is one join + groupBy keyed "
        "by vec_id, O(component diameter) rounds, fail-loud cap."
    ),
)
def similarity_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from argodb_mapreduce_spark.operators.dedup import min_label_components

    vecs = load_table(spark, sf_dir, "embeddings").select(F.col("vec_id").alias("id"))
    pairs = similarity_lsh_neardup(spark, sf_dir).select("a_id", "b_id")
    labels = min_label_components(vecs, pairs, caller="similarity_embedding_clusters")
    return labels.select(F.col("id").alias("vec_id"), "cluster_id")


# ---------------------------------------------------------------------------
# C3 extension — embedding feature normalization + per-dimension profile.
# ---------------------------------------------------------------------------


@register(
    "embedding_normalize_stats",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, CAST(i AS INT) AS pos,
             CAST(ROUND(CAST(embedding[i + 1] AS DOUBLE) * {float(_Q)}) AS BIGINT) AS q
      FROM embeddings, UNNEST(range(0, len(embedding))) AS u(i)
    ), nrm AS (
      SELECT vec_id, SQRT(CAST(SUM(q * q) AS DOUBLE)) / {float(_Q)} AS norm
      FROM q GROUP BY vec_id
    ), nc AS (
      SELECT q.pos, (q.q / {float(_Q)}) / nrm.norm AS v
      FROM q JOIN nrm ON nrm.vec_id = q.vec_id
      WHERE nrm.norm > 0
    )
    SELECT pos,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           {sql_gavg("v")} AS mean_comp,
           MIN(v) AS min_comp,
           MAX(v) AS max_comp
    FROM nc GROUP BY pos
    """,
    tags=("similarity", "vector", "profile"),
    doc=(
        "L2-normalize every embedding, then profile each dimension "
        "(count/mean/min/max of the normalized component) — the feature-"
        "normalization + drift-profile pass an embedding pipeline runs "
        "before ANN indexing. Components ride the 2^-20 quantization "
        "grid so the norm is an exact integer sum in both engines. The "
        "per-dim mean uses oracle_safe.gavg — the 2^-40 power-of-two "
        "grid for irrational per-row values, where a decimal cast "
        "double-rounds in DuckDB and drifted one decimal-ulp from "
        "Spark's BigDecimal cast at sf=0.01 (strict driver sim). "
        "Shuffles O(vectors) for the norm and O(dims) for the "
        "profile — the profile side is map-combinable, so 100 TB of "
        "vectors reduces to dims-sized state per partition."
    ),
)
def embedding_normalize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id", F.posexplode(_quantize(F.col("embedding"))).alias("pos", "q")
    )
    nrm = q.groupBy("vec_id").agg(
        (F.sqrt(F.sum(F.col("q") * F.col("q")).cast("double")) / F.lit(float(_Q))).alias("norm")
    )
    nc = (
        q.join(nrm, "vec_id")
        .filter(F.col("norm") > 0)
        .select("pos", ((F.col("q") / F.lit(float(_Q))) / F.col("norm")).alias("v"))
    )
    return nc.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        gavg("v").alias("mean_comp"),
        F.min("v").alias("min_comp"),
        F.max("v").alias("max_comp"),
    )


# ---------------------------------------------------------------------------
# C3 extension — product quantization: the memory-bound ANN scale path.
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces
PQ_SUBDIM = 8  # dims per subspace (PQ_M * PQ_SUBDIM = embedding dims)
PQ_K = 16  # centroids per subspace (4-bit codes)
PQ_QUERIES = 5  # ADC demo query count
PQ_TOPK = 10

#: Shared encode CTEs: quantized vectors, the seeded codebook (the
#: subvectors of the PQ_K smallest vec_ids — a deterministic Lloyd-0
#: init; a production pipeline would refine it with kmeans_lloyd_step
#: rounds, which changes centroid VALUES but not this dataflow), and
#: the per-(vector, subspace) nearest-centroid assignment.
_SQL_PQ_ENCODE_CTES = f"""
    qv AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * {float(_Q)}) AS BIGINT)) AS qemb
      FROM embeddings
    ), seeds AS (
      SELECT vec_id, qemb,
             CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS code
      FROM qv ORDER BY vec_id LIMIT {PQ_K}
    ), cb AS (
      SELECT s.code, CAST(m AS INT) AS sub_id,
             list_slice(s.qemb, m * {PQ_SUBDIM} + 1, m * {PQ_SUBDIM} + {PQ_SUBDIM}) AS cv
      FROM seeds s, UNNEST(range(0, {PQ_M})) AS u(m)
    ), subs AS (
      SELECT vec_id, CAST(m AS INT) AS sub_id,
             list_slice(qemb, m * {PQ_SUBDIM} + 1, m * {PQ_SUBDIM} + {PQ_SUBDIM}) AS sv
      FROM qv, UNNEST(range(0, {PQ_M})) AS u(m)
    ), cand AS (
      SELECT su.vec_id, su.sub_id, cb.code,
             CAST((SELECT SUM((su.sv[CAST(i AS INT)] - cb.cv[CAST(i AS INT)])
                              * (su.sv[CAST(i AS INT)] - cb.cv[CAST(i AS INT)]))
                   FROM UNNEST(range(1, {PQ_SUBDIM} + 1)) AS r(i)) AS BIGINT) AS dist_sq
      FROM subs su JOIN cb ON cb.sub_id = su.sub_id
    ), assigned AS (
      SELECT vec_id, sub_id, code, dist_sq,
             ROW_NUMBER() OVER (PARTITION BY vec_id, sub_id
                                ORDER BY dist_sq, code) AS rn
      FROM cand
    ), codes AS (
      SELECT vec_id, sub_id, code, dist_sq FROM assigned WHERE rn = 1
    )"""


def _pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, sub_id, code, dist_sq): the PQ code table plus the exact
    integer quantization error of each assignment (grid² units)."""
    qv = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _quantize(F.col("embedding")).alias("qemb")
    )
    w_seed = Window.orderBy("vec_id")
    seeds = (
        qv.orderBy("vec_id")
        .limit(PQ_K)
        .select((F.row_number().over(w_seed) - 1).cast("int").alias("code"), "qemb")
    )

    def subvectors(col: str, out: str) -> Column:
        return F.posexplode(
            F.array(*[F.slice(col, m * PQ_SUBDIM + 1, PQ_SUBDIM) for m in range(PQ_M)])
        ).alias("sub_id", out)

    cb = seeds.select("code", subvectors("qemb", "cv"))
    subs = qv.select("vec_id", subvectors("qemb", "sv"))
    d2 = F.aggregate(
        F.zip_with("sv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cand = subs.join(F.broadcast(cb), "sub_id").select(
        "vec_id", "sub_id", "code", d2.alias("dist_sq")
    )
    best = (
        cand.groupBy("vec_id", "sub_id")
        .agg(F.min(F.struct("dist_sq", "code")).alias("b"))
        .select("vec_id", "sub_id", F.col("b.code").alias("code"), F.col("b.dist_sq").alias("dist_sq"))
    )
    return best


@register(
    "similarity_pq_encode",
    oracle=f"""
    WITH {_SQL_PQ_ENCODE_CTES}
    SELECT vec_id, sub_id, code, dist_sq FROM codes
    """,
    tags=("similarity", "vector", "ann", "pq"),
    doc=(
        f"Product-quantization encode: split each {PQ_M * PQ_SUBDIM}-dim "
        f"vector into {PQ_M} subspaces, assign each subvector to its "
        f"nearest of {PQ_K} codebook centroids (exact integer L2 on the "
        "quantization grid, ties to the lower code), emitting the "
        f"{PQ_M}x4-bit code table plus per-assignment quantization "
        "error. The codebook is a deterministic Lloyd-0 seed (the "
        f"{PQ_K} smallest vec_ids' subvectors) so the whole encode is "
        "oracle-checkable; refining it with kmeans_lloyd_step rounds "
        "changes centroid values, not this dataflow."
    ),
)
def similarity_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ code table — the memory-bound ANN representation (a 64-dim
    float vector compresses to 8 four-bit codes: 64x smaller).

    Scale design: the codebook is TakeOrdered-small and broadcast; the
    subspace explode is a bounded PQ_M-fan map; the argmin is a
    combiner-reduced min-struct aggregate keyed (vec_id, sub_id) — one
    pass over the corpus, no all-pairs anything. Integer distances on
    the quantization grid make assignment and error bit-identical
    across engines and parallelism.
    """
    return _pq_codes(spark, sf_dir)


@register(
    "similarity_pq_adc_topk",
    oracle=f"""
    WITH {_SQL_PQ_ENCODE_CTES}, queries AS (
      SELECT vec_id AS query_id, sub_id, sv FROM subs
      WHERE vec_id IN (SELECT vec_id FROM seeds WHERE code < {PQ_QUERIES})
    ), lut AS (
      SELECT q.query_id, q.sub_id, cb.code,
             CAST((SELECT SUM((q.sv[CAST(i AS INT)] - cb.cv[CAST(i AS INT)])
                              * (q.sv[CAST(i AS INT)] - cb.cv[CAST(i AS INT)]))
                   FROM UNNEST(range(1, {PQ_SUBDIM} + 1)) AS r(i)) AS BIGINT) AS qdist
      FROM queries q JOIN cb ON cb.sub_id = q.sub_id
    ), adc AS (
      SELECT l.query_id, c.vec_id,
             CAST(SUM(l.qdist) AS BIGINT) AS adc_dist
      FROM codes c JOIN lut l ON l.sub_id = c.sub_id AND l.code = c.code
      WHERE c.vec_id <> l.query_id
      GROUP BY l.query_id, c.vec_id
    )
    SELECT query_id, vec_id, adc_dist FROM (
      SELECT query_id, vec_id, adc_dist,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adc_dist, vec_id) AS rn
      FROM adc
    ) WHERE rn <= {PQ_TOPK}
    """,
    tags=("similarity", "vector", "ann", "pq"),
    doc=(
        f"Asymmetric-distance PQ search: per query, precompute the "
        f"{PQ_M}x{PQ_K} lookup table of exact subspace distances to "
        "every centroid, then score each database vector as the SUM of "
        f"{PQ_M} table lookups selected by its stored codes — never "
        f"touching the original vectors. Top-{PQ_TOPK} per query with a "
        "(distance, vec_id) total order; integer distances keep the "
        "ranking bit-identical across engines."
    ),
)
def similarity_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-k over the PQ code table.

    Scale design: the LUT is queries x PQ_M x PQ_K rows — broadcast
    onto the code table keyed (sub_id, code), so search reads ONLY the
    4-bit codes (64x less IO than raw vectors); the per-(query, vector)
    sum is a combiner-reduced aggregate and the top-k is a bounded
    window per query. This is the memory-bound complement to the
    compute-bound IVF path: IVF prunes candidates, PQ compresses
    storage; production engines stack them (IVF-PQ) — here each stage
    is a separately oracle-checked operator.
    """
    qv = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _quantize(F.col("embedding")).alias("qemb")
    )
    w_seed = Window.orderBy("vec_id")
    seeds = (
        qv.orderBy("vec_id")
        .limit(PQ_K)
        .select((F.row_number().over(w_seed) - 1).cast("int").alias("code"), "qemb")
    )

    def subvectors(col: str, out: str) -> Column:
        return F.posexplode(
            F.array(*[F.slice(col, m * PQ_SUBDIM + 1, PQ_SUBDIM) for m in range(PQ_M)])
        ).alias("sub_id", out)

    cb = seeds.select("code", subvectors("qemb", "cv"))
    # The ADC queries are the PQ_QUERIES smallest vec_ids — the first
    # PQ_QUERIES codebook seeds, so the demo needs no extra scan.
    queries = (
        qv.orderBy("vec_id")
        .limit(PQ_QUERIES)
        .select(F.col("vec_id").alias("query_id"), subvectors("qemb", "sv"))
    )
    d2 = F.aggregate(
        F.zip_with("sv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    lut = queries.join(F.broadcast(cb), "sub_id").select(
        "query_id", "sub_id", "code", d2.alias("qdist")
    )
    codes = _pq_codes(spark, sf_dir).select("vec_id", "sub_id", "code")
    adc = (
        codes.join(F.broadcast(lut), ["sub_id", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("qdist").alias("adc_dist"))
    )
    w_top = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    return (
        adc.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= PQ_TOPK)
        .select("query_id", "vec_id", "adc_dist")
    )


IVFPQ_PROBES = 4  # coarse lists scanned per query

_PQ_DIMS = PQ_M * PQ_SUBDIM


def _sql_l2(a: str, b: str, n: int) -> str:
    """Exact integer squared-L2 between two BIGINT lists of length n."""
    return (
        f"CAST((SELECT SUM(({a}[CAST(i AS INT)] - {b}[CAST(i AS INT)])"
        f" * ({a}[CAST(i AS INT)] - {b}[CAST(i AS INT)]))"
        f" FROM UNNEST(range(1, {n} + 1)) AS r(i)) AS BIGINT)"
    )


def _ivfpq_pipeline(spark: SparkSession, sf_dir: str):
    """Shared IVF-PQ dataflow: returns (e, queries, adc) where e is the
    quantized vector table (vec_id, qemb), queries the PQ_QUERIES probe
    vectors (query_id, qq), and adc the probe-pruned asymmetric-distance
    candidates (query_id, vec_id, adc_dist). Both the plain top-k and
    the exact-re-rank refined variant rank from this one pipeline."""
    e, cent, cbq, codes = _ivfpq_encode(spark, sf_dir)
    queries = e.filter(F.col("vec_id") < PQ_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qemb").alias("qq")
    )
    adc = _ivfpq_adc_from(queries, cent, cbq, codes)
    return e, queries, adc


def _ivfpq_encode_from(e: DataFrame, cent: DataFrame):
    """ENCODE against a GIVEN centroid table: coarse-assign every vector
    of corpus ``e`` (vec_id, qemb), PQ-encode the residual; the codebook
    is trained on the residuals of the corpus' PQ_K lowest vec_ids under
    THESE centroids. Returns (cbq, codes). Decoupled so the refresh
    lifecycle can encode the same corpus under stale vs retrained
    centroid sets (similarity_index_refresh)."""
    cd = e.crossJoin(F.broadcast(cent)).select(
        "vec_id", "qemb", "cid", _ivfpq_l2(F.col("qemb"), F.col("cemb")).alias("cdist")
    )
    asg = (
        cd.groupBy("vec_id")
        .agg(F.min(F.struct("cdist", "cid")).alias("b"), F.any_value("qemb").alias("qemb"))
        .select("vec_id", "qemb", F.col("b.cid").alias("cid"))
        .join(F.broadcast(cent), "cid")
    )
    resid = asg.select(
        "vec_id", "cid", F.zip_with("qemb", "cemb", lambda a, b: a - b).alias("r")
    )
    cbq = resid.filter(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").cast("int").alias("code"), _ivfpq_subvectors("r", "cv")
    )
    rsubs = resid.select("vec_id", "cid", _ivfpq_subvectors("r", "sv"))
    codes = (
        rsubs.join(F.broadcast(cbq), "sub_id")
        .select("vec_id", "cid", "sub_id", "code", _ivfpq_l2(F.col("sv"), F.col("cv")).alias("dist_sq"))
        .groupBy("vec_id", "cid", "sub_id")
        .agg(F.min(F.struct("dist_sq", "code")).alias("b"))
        .select("vec_id", "cid", "sub_id", F.col("b.code").alias("code"))
    )
    return cbq, codes


def _ivfpq_encode(spark: SparkSession, sf_dir: str):
    """The ENCODE half of IVF-PQ: coarse-assign every vector, PQ-encode
    the residual. Returns (e, cent, cbq, codes) — cent/cbq/codes are
    the three index artifacts a production stack PERSISTS
    (similarity_index_build) so search runs off stored codes."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _quantize(F.col("embedding")).alias("qemb")
    )
    cent = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("qemb").alias("cemb")
    )
    cbq, codes = _ivfpq_encode_from(e, cent)
    return e, cent, cbq, codes


def _ivfpq_l2(a, b) -> Column:
    """Exact integer squared-L2 between two quantized array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _ivfpq_subvectors(col, out: str) -> Column:
    return F.posexplode(
        F.array(*[F.slice(col, m * PQ_SUBDIM + 1, PQ_SUBDIM) for m in range(PQ_M)])
    ).alias("sub_id", out)


def _ivfpq_adc_from(
    queries: DataFrame,
    cent: DataFrame,
    cbq: DataFrame,
    codes: DataFrame,
    probes: int = IVFPQ_PROBES,
) -> DataFrame:
    """The SEARCH half of IVF-PQ, decoupled from encoding: probe-prune
    against the centroid table, build per-(query, list) residual LUTs
    against the codebook, rank the stored code table by ADC. Takes the
    index tables as DataFrames so the same assembly runs off the live
    encode pipeline or off a PERSISTED index (similarity_index_search) —
    search never touches raw vectors except the query set."""
    w_probe = Window.partitionBy("query_id").orderBy("qcdist", "cid")
    qprobe = (
        queries.crossJoin(F.broadcast(cent))
        .select(
            "query_id", "qq", "cid", "cemb",
            _ivfpq_l2(F.col("qq"), F.col("cemb")).alias("qcdist"),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= probes)
    )
    qsubs = qprobe.select(
        "query_id", "cid",
        _ivfpq_subvectors(F.zip_with("qq", "cemb", lambda a, b: a - b), "qsv"),
    )
    lut = qsubs.join(F.broadcast(cbq), "sub_id").select(
        "query_id", "cid", "sub_id", "code",
        _ivfpq_l2(F.col("qsv"), F.col("cv")).alias("qdist"),
    )
    return (
        codes.join(F.broadcast(lut), ["cid", "sub_id", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("qdist").alias("adc_dist"))
    )


def _sql_ivfpq_search(
    sfx: str,
    codes: str,
    cbq: str,
    cent: str,
    queries: str,
    probes: int = IVFPQ_PROBES,
) -> str:
    """The SEARCH half of the IVF-PQ oracle: probe-prune (``probes``
    lists; pass N_CENTROIDS to scan all — the pre-filter regime), build
    per-(query, list) LUTs against ``cbq``, rank ``codes`` by ADC. The
    SQL twin of ``_ivfpq_adc_from(..., probes=)``, factored so a
    filtered code table or a different probe budget never copies the
    residual/LUT/ADC math."""
    return f"""qprobe{sfx} AS (
      SELECT query_id, cid, cemb FROM (
        SELECT q.query_id, c.cid, c.cemb,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                                  ORDER BY {_sql_l2("q.qemb", "c.cemb", _PQ_DIMS)}, c.cid) AS rn
        FROM {queries} q CROSS JOIN {cent} c
      ) WHERE rn <= {probes}
    ), qresid{sfx} AS (
      SELECT p.query_id, p.cid,
             list_transform(range(1, {_PQ_DIMS} + 1),
               i -> q.qemb[CAST(i AS INT)] - p.cemb[CAST(i AS INT)]) AS r
      FROM qprobe{sfx} p JOIN {queries} q ON q.query_id = p.query_id
    ), qsubs{sfx} AS (
      SELECT query_id, cid, CAST(m AS INT) AS sub_id,
             list_slice(r, m * {PQ_SUBDIM} + 1, m * {PQ_SUBDIM} + {PQ_SUBDIM}) AS qsv
      FROM qresid{sfx}, UNNEST(range(0, {PQ_M})) AS u(m)
    ), lut{sfx} AS (
      SELECT s.query_id, s.cid, s.sub_id, cb.code,
             {_sql_l2("s.qsv", "cb.cv", PQ_SUBDIM)} AS qdist
      FROM qsubs{sfx} s JOIN {cbq} cb ON cb.sub_id = s.sub_id
    ), adc{sfx} AS (
      SELECT l.query_id, c.vec_id, CAST(SUM(l.qdist) AS BIGINT) AS adc_dist
      FROM {codes} c
      JOIN lut{sfx} l ON l.cid = c.cid AND l.sub_id = c.sub_id AND l.code = c.code
      WHERE c.vec_id <> l.query_id
      GROUP BY l.query_id, c.vec_id
    )"""


def _sql_ivfpq_block(sfx: str, corpus: str, cent: str, queries: str) -> str:
    """DuckDB CTE chain for one IVF-PQ index instance: encode ``corpus``
    (vec_id, qemb) against centroid table ``cent`` (cid, cemb), then
    ADC-search it for ``queries`` (query_id, qemb). All CTE names carry
    ``sfx`` so two instances (e.g. a stale and a retrained index —
    similarity_index_refresh) compose inside one WITH. ``sfx=''``
    reproduces the original shared dataflow verbatim."""
    return f"""cd{sfx} AS (
      SELECT v.vec_id, v.qemb, c.cid, c.cemb,
             {_sql_l2("v.qemb", "c.cemb", _PQ_DIMS)} AS cdist
      FROM {corpus} v CROSS JOIN {cent} c
    ), asg{sfx} AS (
      SELECT vec_id, qemb, cid, cemb FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cdist, cid) AS rn
        FROM cd{sfx}
      ) WHERE rn = 1
    ), resid{sfx} AS (
      SELECT vec_id, cid,
             list_transform(range(1, {_PQ_DIMS} + 1),
               i -> qemb[CAST(i AS INT)] - cemb[CAST(i AS INT)]) AS r
      FROM asg{sfx}
    ), cbq{sfx} AS (
      SELECT CAST(s.vec_id AS INT) AS code, CAST(m AS INT) AS sub_id,
             list_slice(s.r, m * {PQ_SUBDIM} + 1, m * {PQ_SUBDIM} + {PQ_SUBDIM}) AS cv
      FROM resid{sfx} s, UNNEST(range(0, {PQ_M})) AS u(m)
      WHERE s.vec_id < {PQ_K}
    ), rsubs{sfx} AS (
      SELECT vec_id, cid, CAST(m AS INT) AS sub_id,
             list_slice(r, m * {PQ_SUBDIM} + 1, m * {PQ_SUBDIM} + {PQ_SUBDIM}) AS sv
      FROM resid{sfx}, UNNEST(range(0, {PQ_M})) AS u(m)
    ), cand{sfx} AS (
      SELECT su.vec_id, su.cid, su.sub_id, cb.code,
             {_sql_l2("su.sv", "cb.cv", PQ_SUBDIM)} AS dist_sq
      FROM rsubs{sfx} su JOIN cbq{sfx} cb ON cb.sub_id = su.sub_id
    ), codes{sfx} AS (
      SELECT vec_id, cid, sub_id, code FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub_id
                                     ORDER BY dist_sq, code) AS rn
        FROM cand{sfx}
      ) WHERE rn = 1
    ), {_sql_ivfpq_search(sfx, f"codes{sfx}", f"cbq{sfx}", cent, queries)}"""


#: Shared IVF-PQ oracle dataflow (through the probe-pruned ADC
#: candidates) — both the plain top-k and the refined re-rank extend it.
_SQL_IVFPQ_CTES = f"""
    WITH qv AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * {float(_Q)}) AS BIGINT)) AS qemb
      FROM embeddings
    ), cent AS (
      SELECT vec_id AS cid, qemb AS cemb FROM qv WHERE vec_id < {N_CENTROIDS}
    ), queries AS (
      SELECT vec_id AS query_id, qemb FROM qv WHERE vec_id < {PQ_QUERIES}
    ), {_sql_ivfpq_block("", "qv", "cent", "queries")}
"""


@register(
    "similarity_ivfpq_topk",
    oracle=f"""
    {_SQL_IVFPQ_CTES}
    SELECT query_id, vec_id, adc_dist FROM (
      SELECT query_id, vec_id, adc_dist,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adc_dist, vec_id) AS rn
      FROM adc
    ) WHERE rn <= {PQ_TOPK}
    """,
    tags=("similarity", "vector", "ann", "pq", "ivf"),
    doc=(
        f"Stacked IVF-PQ search — the production ANN architecture: "
        f"coarse-assign every vector to its nearest of {N_CENTROIDS} "
        "centroids by exact integer L2, PQ-encode the RESIDUAL "
        "(vector − centroid, still exact integers on the grid), then "
        f"per query probe the {IVFPQ_PROBES} nearest lists and rank "
        "members by asymmetric distance over per-(query, list) residual "
        f"lookup tables. Top-{PQ_TOPK} under a (distance, vec_id) total "
        "order; every stage deterministic, so the full stack is "
        "hash-checked against the oracle."
    ),
)
def similarity_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: coarse pruning + residual codes + ADC ranking.

    Scale design: coarse assignment is one broadcast-centroid pass
    (min-struct aggregate, no shuffle beyond the agg); residual encode
    is the same bounded-fan map + broadcast-codebook argmin as
    similarity_pq_encode; search joins the 4-bit code table against a
    broadcast LUT keyed (cid, sub_id, code) — only members of probed
    lists match, so the probe pruning rides the join instead of a
    separate filter pass. IO at search time is the code table (64x
    smaller than raw vectors); candidate volume is n x probes/lists.
    Centroids and PQ seeds are deterministic fixture ids (vec_id <
    K) — kmeans training changes their values, not this dataflow.
    """
    _e, _queries, adc = _ivfpq_pipeline(spark, sf_dir)
    w_top = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    return (
        adc.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= PQ_TOPK)
        .select("query_id", "vec_id", "adc_dist")
    )


IVFPQ_REFINE_C = 30  #: ADC candidates re-ranked exactly per query


def _exact_rerank(
    shortlist: DataFrame, vectors: DataFrame, queries: DataFrame, k: int
) -> DataFrame:
    """(query_id, vec_id, exact_dist, rank<=k): exact integer-L2
    re-rank of an ADC ``shortlist`` — one candidate-bounded equi-join
    against the quantized ``vectors`` (vec_id, qemb) plus the broadcast
    ``queries`` (query_id, qq). The refined-serving shape shared by
    similarity_ivfpq_refined and similarity_filtered_topk: PQ picks
    candidates, true distances pick winners."""
    exact = (
        shortlist.join(vectors, "vec_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id", "vec_id",
            _ivfpq_l2(F.col("qq"), F.col("qemb")).alias("exact_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("exact_dist"), F.asc("vec_id"))
    return exact.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


@register(
    "similarity_ivfpq_refined",
    oracle=f"""
    {_SQL_IVFPQ_CTES}
    , cand_c AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adc_dist, vec_id) AS rn
        FROM adc
      ) WHERE rn <= {IVFPQ_REFINE_C}
    ), exact AS (
      SELECT c.query_id, c.vec_id,
             {_sql_l2("q.qemb", "v.qemb", _PQ_DIMS)} AS exact_dist
      FROM cand_c c
      JOIN qv v ON v.vec_id = c.vec_id
      JOIN queries q ON q.query_id = c.query_id
    ), refined AS (
      SELECT query_id, vec_id, exact_dist,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY exact_dist, vec_id) AS BIGINT) AS rank
      FROM exact
      QUALIFY rank <= {PQ_TOPK}
    ), truth AS (
      SELECT q.query_id, v.vec_id,
             {_sql_l2("q.qemb", "v.qemb", _PQ_DIMS)} AS tdist
      FROM qv v CROSS JOIN queries q
      WHERE v.vec_id <> q.query_id
    ), truth_k AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY tdist, vec_id) AS rn
        FROM truth
      ) WHERE rn <= {PQ_TOPK}
    ), adc_k AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adc_dist, vec_id) AS rn
        FROM adc
      ) WHERE rn <= {PQ_TOPK}
    ), r_ref AS (
      SELECT r.query_id, CAST(COUNT(t.vec_id) AS DOUBLE) / {PQ_TOPK} AS recall_refined
      FROM refined r
      LEFT JOIN truth_k t ON t.query_id = r.query_id AND t.vec_id = r.vec_id
      GROUP BY r.query_id
    ), r_adc AS (
      SELECT a.query_id, CAST(COUNT(t.vec_id) AS DOUBLE) / {PQ_TOPK} AS recall_adc
      FROM adc_k a
      LEFT JOIN truth_k t ON t.query_id = a.query_id AND t.vec_id = a.vec_id
      GROUP BY a.query_id
    )
    SELECT r.query_id, r.rank, r.vec_id, r.exact_dist,
           rr.recall_refined, ra.recall_adc
    FROM refined r
    JOIN r_ref rr ON rr.query_id = r.query_id
    JOIN r_adc ra ON ra.query_id = r.query_id
    """,
    tags=("similarity", "vector", "ann", "pq", "ivf", "rerank"),
    doc=(
        f"IVF-PQ with an exact re-rank refine stage — what production "
        f"ANN stacks do to recover the recall ADC quantization loses: "
        f"take the top-{IVFPQ_REFINE_C} ADC candidates per query, fetch "
        f"their ORIGINAL vectors by one equi-join, re-rank by exact "
        f"integer L2, keep the top-{PQ_TOPK}. Emits per-query "
        f"recall@{PQ_TOPK} against the exact brute-force truth for both "
        f"the refined and the unrefined ranking; refined >= unrefined "
        f"is asserted in tests (refined recall is provably >= whenever "
        f"the true neighbors survive the candidate cut)."
    ),
)
def similarity_ivfpq_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost shape at 100x: the refine stage touches IVFPQ_REFINE_C x
    |queries| rows — an equi-join against the vector table on vec_id
    (shuffle bounded by the candidate set, never O(n)); the brute-force
    truth/recall legs are a SELF-CHECK bounded by the constant
    PQ_QUERIES and drop out of a production deployment (recall is
    estimated offline on a sampled query set exactly like this)."""
    e, queries, adc = _ivfpq_pipeline(spark, sf_dir)

    def l2(a, b) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    w_adc = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    ranked_adc = adc.withColumn("rn", F.row_number().over(w_adc))
    cand = ranked_adc.filter(F.col("rn") <= IVFPQ_REFINE_C).select("query_id", "vec_id")
    refined = _exact_rerank(cand, e, queries, PQ_TOPK)

    # Exact ground truth: the vector table against the CONSTANT-size
    # broadcast query set — bounded map-side fan-out, self-check only.
    truth = (
        e.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", l2(F.col("qq"), F.col("qemb")).alias("tdist"))
    )
    w_truth = Window.partitionBy("query_id").orderBy(F.asc("tdist"), F.asc("vec_id"))
    truth_k = (
        truth.withColumn("rn", F.row_number().over(w_truth))
        .filter(F.col("rn") <= PQ_TOPK)
        .select("query_id", "vec_id")
    )
    adc_k = ranked_adc.filter(F.col("rn") <= PQ_TOPK).select("query_id", "vec_id")

    def recall(hits: DataFrame, name: str) -> DataFrame:
        return (
            hits.join(truth_k.withColumn("hit", F.lit(1)), ["query_id", "vec_id"], "left")
            .groupBy("query_id")
            .agg((F.count("hit").cast("double") / PQ_TOPK).alias(name))
        )

    r_ref = recall(refined.select("query_id", "vec_id"), "recall_refined")
    r_adc = recall(adc_k, "recall_adc")
    return (
        refined.join(F.broadcast(r_ref), "query_id")
        .join(F.broadcast(r_adc), "query_id")
        .select("query_id", "rank", "vec_id", "exact_dist", "recall_refined", "recall_adc")
    )



# ---------------------------------------------------------------------------
# Scalar int8 quantization (the faiss-SQ8 storage path)
# ---------------------------------------------------------------------------

SQ8_MAX = 127  #: symmetric int8 code range [-127, 127]


@register(
    "embedding_int8_quantize",
    oracle=f"""
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    s AS (
        SELECT vec_id, e,
               list_aggregate(list_transform(e, x -> abs(x)), 'max') AS maxabs
        FROM v
    ),
    q AS (
        SELECT vec_id, e, maxabs,
               maxabs / {SQ8_MAX} AS scale,
               CASE WHEN maxabs = 0
                    THEN list_transform(e, x -> CAST(0 AS INT))
                    ELSE list_transform(e, x -> CAST(ROUND(x * {SQ8_MAX} / maxabs) AS INT))
               END AS codes
        FROM s
    )
    SELECT vec_id,
           CAST(len(e) AS INT) AS n_dims,
           scale,
           CAST(list_aggregate(codes, 'min') AS INT) AS qmin,
           CAST(list_aggregate(codes, 'max') AS INT) AS qmax,
           CASE WHEN maxabs = 0 THEN 0.0 ELSE
               list_aggregate(
                   list_transform(range(1, len(e) + 1),
                                  i -> abs(e[i] - codes[i] * scale)), 'max')
           END AS max_abs_err
    FROM q
    """,
    tags=("similarity", "vector", "quantization"),
    doc=(
        f"Scalar int8 quantization (the faiss-SQ8 storage path): "
        f"per-vector symmetric scale = max|x|/{SQ8_MAX}, codes = "
        f"round(x/scale) in [-{SQ8_MAX}, {SQ8_MAX}] — 4x smaller than "
        f"float32 with one multiply to dequantize, the standard "
        f"vector-lake storage tier below PQ. The audit columns are all "
        f"ORDER-INDEPENDENT per-vector stats (max/min — never a float "
        f"sum), so the reconstruction-error check is engine-exact "
        f"without grid tricks."
    ),
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure per-row array expressions in codegen — no shuffle at all;
    at 100 TB this is a map-only rewrite pass over the vector lake,
    writing codes + scale next to (or instead of) the float column."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("e"),
    )
    s = e.select(
        "vec_id", "e",
        F.expr("array_max(transform(e, x -> abs(x)))").alias("maxabs"),
    )
    q = s.select(
        "vec_id", "e", "maxabs",
        (F.col("maxabs") / SQ8_MAX).alias("scale"),
        F.expr(
            f"IF(maxabs = 0, transform(e, x -> 0), "
            f"transform(e, x -> cast(round(x * {SQ8_MAX} / maxabs) as int)))"
        ).alias("codes"),
    )
    return q.select(
        "vec_id",
        F.size("e").alias("n_dims"),
        "scale",
        F.expr("array_min(codes)").cast("int").alias("qmin"),
        F.expr("array_max(codes)").cast("int").alias("qmax"),
        F.expr(
            f"IF(maxabs = 0, cast(0.0 as double), "
            f"array_max(zip_with(e, codes, (x, c) -> abs(x - c * (maxabs / {SQ8_MAX})))))"
        ).alias("max_abs_err"),
    )


# ---------------------------------------------------------------------------
# Persisted ANN index: build once, search from stored codes
# ---------------------------------------------------------------------------

def _ivfpq_index_root(sf_dir: str) -> str:
    import os
    import tempfile

    tag = sf_dir.strip("/").replace("/", "_")
    return os.path.join(
        tempfile.gettempdir(), "argodb_mapreduce_spark", tag, "ivfpq_index"
    )


def _ensure_ivfpq_index(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the three IVF-PQ index artifacts (centroids, PQ
    codebook, code table) into versioned tables if absent or staler
    than the fixture. Incremental shape: a daily ingest appends its new
    vectors' codes via versioned_write(mode='append') — a manifest-only
    publish, nothing rewrites the banked codes.

    NOTE on oracle parity: similarity_index_build/search recompute their
    DuckDB oracles from the pristine corpus, so parity is guaranteed
    only for the untouched initial build; a test that appends must
    invalidate the _BUILT marker before mutating and restore it only
    after a verified rollback (tests/test_round8_ops.py).

    Concurrent sessions (driver sweep + bench/pytest) may race here;
    the build is serialized with an atomic mkdir lock — losers wait for
    the winner's marker instead of colliding inside versioned_write's
    errorifexists segment write (ADVICE r8).
    """
    from argodb_mapreduce_spark.catalog import table_path
    from argodb_mapreduce_spark.sources.versioned import versioned_write

    root = _ivfpq_index_root(sf_dir)

    def build():
        import os
        import shutil

        _e, cent, cbq, codes = _ivfpq_encode(spark, sf_dir)
        for name, df in (("cent", cent), ("cbq", cbq), ("codes", codes)):
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
            versioned_write(df, os.path.join(root, name), mode="overwrite")

    _locked_build(root, table_path(sf_dir, "embeddings"), build)
    return root


def _locked_build(root: str, src: str, build) -> None:
    """Run ``build()`` exactly once per stale fixture across concurrent
    sessions: atomic-mkdir lock; losers wait for the winner's _BUILT
    marker; stale locks from crashed builders expire after 10 min."""
    import os
    import shutil
    import time

    from argodb_mapreduce_spark.catalog import fixture_stale

    marker = os.path.join(root, "_BUILT")
    if not fixture_stale(src, marker):
        return
    os.makedirs(root, exist_ok=True)
    lock = os.path.join(root, "_BUILDING")
    deadline = time.monotonic() + 600
    while True:
        try:
            os.mkdir(lock)  # atomic on POSIX: exactly one builder wins
            break
        except FileExistsError:
            if time.monotonic() > deadline:
                shutil.rmtree(lock, ignore_errors=True)
                continue
            time.sleep(0.5)
            if not fixture_stale(src, marker):
                return  # the winner finished while we waited
    try:
        if fixture_stale(src, marker):  # re-check under the lock
            build()
            with open(marker, "w") as fh:
                fh.write("ok")
    finally:
        shutil.rmtree(lock, ignore_errors=True)


_SQL_IVFPQ_INDEX_SUMMARY = f"""
    {_SQL_IVFPQ_CTES}
    SELECT CAST(cid AS INT) AS cid,
           CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_vectors,
           CAST(COUNT(*) AS BIGINT) AS n_code_rows
    FROM codes
    GROUP BY cid
"""


@register(
    "similarity_index_build",
    oracle=_SQL_IVFPQ_INDEX_SUMMARY,
    tags=("similarity", "vector", "ann", "index", "sink"),
    doc=(
        f"ANN index PERSISTENCE: encode the corpus once (coarse assign "
        f"+ residual PQ) and publish centroids/codebook/code-table as "
        f"three versioned tables (manifest-pinned snapshots — the same "
        f"store the snapshot_* ops use), then report per-list "
        f"occupancy read BACK from the stored code table. Search runs "
        f"off this artifact without touching raw vectors "
        f"(similarity_index_search); a daily ingest appends new codes "
        f"as a manifest-only publish."
    ),
)
def similarity_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The summary is O(lists) rows; building shuffles what the encode
    pipeline always shuffles. At 100 TB the code table is ~64x smaller
    than the vectors and bucketed by cid so probes co-locate."""
    import os

    from argodb_mapreduce_spark.sources.versioned import snapshot_read

    root = _ensure_ivfpq_index(spark, sf_dir)
    stored = snapshot_read(spark, os.path.join(root, "codes"))
    return stored.groupBy(F.col("cid").cast("int").alias("cid")).agg(
        F.count_distinct("vec_id").alias("n_vectors"),
        F.count(F.lit(1)).alias("n_code_rows"),
    )


@register(
    "similarity_index_search",
    oracle=f"""
    {_SQL_IVFPQ_CTES}
    SELECT query_id, vec_id, adc_dist FROM (
      SELECT query_id, vec_id, adc_dist,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adc_dist, vec_id) AS rn
      FROM adc
    ) WHERE rn <= {PQ_TOPK}
    """,
    tags=("similarity", "vector", "ann", "index"),
    doc=(
        f"ANN search FROM THE PERSISTED INDEX: read the versioned "
        f"centroid/codebook/code tables (similarity_index_build) and "
        f"rank by ADC — raw vectors are touched only for the "
        f"{PQ_QUERIES} query embeddings. Bit-identical results to the "
        f"live-encode similarity_ivfpq_topk (same oracle), proving the "
        f"persisted artifact is lossless. This is the production "
        f"serving path: index IO is the 64x-compressed code table."
    ),
)
def similarity_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from argodb_mapreduce_spark.sources.versioned import snapshot_read

    root = _ensure_ivfpq_index(spark, sf_dir)
    cent = snapshot_read(spark, os.path.join(root, "cent"))
    cbq = snapshot_read(spark, os.path.join(root, "cbq"))
    codes = snapshot_read(spark, os.path.join(root, "codes"))
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _quantize(F.col("embedding")).alias("qemb")
    )
    queries = e.filter(F.col("vec_id") < PQ_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qemb").alias("qq")
    )
    adc = _ivfpq_adc_from(queries, cent, cbq, codes)
    w_top = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    return (
        adc.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= PQ_TOPK)
        .select("query_id", "vec_id", "adc_dist")
    )


# ---------------------------------------------------------------------------
# Filtered ANN: predicate + top-k over the persisted index (VERDICT r10 #8)
# ---------------------------------------------------------------------------

FILTERED_LABEL = 3  #: the metadata predicate's pivot label
#: Selectivity at or below which the planner PRE-filters (scan only the
#: matching vectors' codes); above it, POST-filter (rank an inflated
#: top-k, then filter) keeps the ANN pruning effective.
PREFILTER_MAX_SEL = 0.5
POSTFILTER_INFLATE = 3  #: post-filter ADC-shortlist over-fetch factor
#: (the pre-filter shortlist of IVFPQ_REFINE_C candidates over-fetches
#: to IVFPQ_REFINE_C * POSTFILTER_INFLATE before the predicate filter)

_SQL_FILTERED_TOPK = f"""
    {_SQL_IVFPQ_CTES}
    , labels AS (SELECT vec_id, label FROM embeddings)
    , codes_low AS (
      SELECT c.* FROM codes c
      JOIN labels l ON l.vec_id = c.vec_id AND l.label = {FILTERED_LABEL}
    ), {_sql_ivfpq_search("_low", "codes_low", "cbq", "cent", "queries", probes=N_CENTROIDS)}
    , short_low AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adc_dist, vec_id) AS rn
        FROM adc_low
      ) WHERE rn <= {IVFPQ_REFINE_C})
    , top_low AS (
      SELECT query_id, vec_id FROM (
        SELECT s.query_id, s.vec_id,
               ROW_NUMBER() OVER (PARTITION BY s.query_id
                 ORDER BY {_sql_l2("q.qemb", "v.qemb", _PQ_DIMS)}, s.vec_id) AS rn
        FROM short_low s
        JOIN qv v ON v.vec_id = s.vec_id
        JOIN queries q ON q.query_id = s.query_id
      ) WHERE rn <= {PQ_TOPK})
    , exact_low AS (
      SELECT query_id, vec_id FROM (
        SELECT q.query_id, v.vec_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                 ORDER BY {_sql_l2("q.qemb", "v.qemb", _PQ_DIMS)}, v.vec_id) AS rn
        FROM queries q CROSS JOIN (
          SELECT qv.vec_id, qv.qemb FROM qv
          JOIN labels l ON l.vec_id = qv.vec_id AND l.label = {FILTERED_LABEL}
        ) v
        WHERE v.vec_id <> q.query_id
      ) WHERE rn <= {PQ_TOPK})
    , raw_high AS (
      SELECT query_id, vec_id, adc_dist FROM (
        SELECT query_id, vec_id, adc_dist,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adc_dist, vec_id) AS rn
        FROM adc
      ) WHERE rn <= {IVFPQ_REFINE_C * POSTFILTER_INFLATE})
    , short_high AS (
      SELECT query_id, vec_id FROM (
        SELECT r.query_id, r.vec_id,
               ROW_NUMBER() OVER (PARTITION BY r.query_id
                                  ORDER BY r.adc_dist, r.vec_id) AS rn
        FROM raw_high r JOIN labels l
          ON l.vec_id = r.vec_id AND l.label <> {FILTERED_LABEL}
      ) WHERE rn <= {IVFPQ_REFINE_C})
    , top_high AS (
      SELECT query_id, vec_id FROM (
        SELECT s.query_id, s.vec_id,
               ROW_NUMBER() OVER (PARTITION BY s.query_id
                 ORDER BY {_sql_l2("q.qemb", "v.qemb", _PQ_DIMS)}, s.vec_id) AS rn
        FROM short_high s
        JOIN qv v ON v.vec_id = s.vec_id
        JOIN queries q ON q.query_id = s.query_id
      ) WHERE rn <= {PQ_TOPK})
    , exact_high AS (
      SELECT query_id, vec_id FROM (
        SELECT q.query_id, v.vec_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                 ORDER BY {_sql_l2("q.qemb", "v.qemb", _PQ_DIMS)}, v.vec_id) AS rn
        FROM queries q CROSS JOIN (
          SELECT qv.vec_id, qv.qemb FROM qv
          JOIN labels l ON l.vec_id = qv.vec_id AND l.label <> {FILTERED_LABEL}
        ) v
        WHERE v.vec_id <> q.query_id
      ) WHERE rn <= {PQ_TOPK})
    SELECT 'low' AS regime, 'pre-filter' AS strategy,
           (SELECT CAST(COUNT(*) AS DOUBLE) * 100 / (SELECT COUNT(*) FROM labels)
              FROM labels WHERE label = {FILTERED_LABEL}) AS selectivity_pct,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM top_low) AS n_results,
           (SELECT CAST(COUNT(*) AS DOUBLE) * 100 / {PQ_QUERIES * PQ_TOPK}
              FROM top_low t JOIN exact_low e
                ON e.query_id = t.query_id AND e.vec_id = t.vec_id)
               AS recall_vs_exact_pct
    UNION ALL
    SELECT 'high', 'post-filter',
           (SELECT CAST(COUNT(*) AS DOUBLE) * 100 / (SELECT COUNT(*) FROM labels)
              FROM labels WHERE label <> {FILTERED_LABEL}),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM top_high),
           (SELECT CAST(COUNT(*) AS DOUBLE) * 100 / {PQ_QUERIES * PQ_TOPK}
              FROM top_high t JOIN exact_high e
                ON e.query_id = t.query_id AND e.vec_id = t.vec_id)
"""


@register(
    "similarity_filtered_topk",
    oracle=_SQL_FILTERED_TOPK,
    tags=("similarity", "vector", "ann", "index", "filter"),
    doc=(
        f"FILTERED ANN over the persisted IVF-PQ index (VERDICT r10 "
        f"#8, the production vector-search shape): a metadata predicate "
        f"rides the top-k search, and the planner picks the strategy "
        f"from an ANALYZE-style frequency stat — selectivity <= "
        f"{PREFILTER_MAX_SEL} PRE-filters (only matching vectors' "
        f"stored codes are ADC-ranked ACROSS ALL LISTS — the filtered "
        f"candidate set is small, so nothing is lost to nprobe), "
        f"above it POST-filters (rank an inflated ADC shortlist, "
        f"filter, keep {IVFPQ_REFINE_C}). BOTH regimes finish with an "
        f"exact RE-RANK of the {IVFPQ_REFINE_C}-candidate shortlist "
        f"(the refined-serving shape of similarity_ivfpq_refined) and "
        f"cut to top-{PQ_TOPK}. Both run in one query (label = vs <> "
        f"{FILTERED_LABEL}), each with a RECALL SELF-CHECK against "
        f"the exact filtered brute-force baseline — strategy choice, "
        f"result sizes, and recall all hash-checked against DuckDB "
        f"running the identical pipeline."
    ),
)
def similarity_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: pre-filter reads O(matching codes) via a broadcast
    semi-join on the (64x-compressed) code table; post-filter pays the
    plain probe-pruned ADC plus a broadcast filter of k*inflate rows
    per query. The frequency stat is one combiner-reduced count —
    production keeps it alongside ANALYZE statistics."""
    import os

    from argodb_mapreduce_spark.sources.versioned import snapshot_read

    root = _ensure_ivfpq_index(spark, sf_dir)
    cent = snapshot_read(spark, os.path.join(root, "cent"))
    cbq = snapshot_read(spark, os.path.join(root, "cbq"))
    codes = snapshot_read(spark, os.path.join(root, "codes"))
    e = load_table(spark, sf_dir, "embeddings")
    eq = e.select("vec_id", _quantize(F.col("embedding")).alias("qemb"))
    meta = e.select("vec_id", "label")
    queries = eq.filter(F.col("vec_id") < PQ_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qemb").alias("qq")
    )
    # ONE combiner-reduced pass for all three frequency stats (guide
    # §1.2 don't compute twice: was meta.count() + one fids.count() per
    # regime = 3 jobs over the same column).
    stats = meta.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum((F.col("label") == FILTERED_LABEL).cast("long")).alias("n_low"),
        F.sum((F.col("label") != FILTERED_LABEL).cast("long")).alias("n_high"),
    ).first()
    total = stats["total"]
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("vec_id"))
    regime_aggs = []
    for regime, cond, n_pass in (
        ("low", F.col("label") == FILTERED_LABEL, stats["n_low"]),
        ("high", F.col("label") != FILTERED_LABEL, stats["n_high"]),
    ):
        fids = meta.filter(cond).select("vec_id")
        if n_pass / total <= PREFILTER_MAX_SEL:
            strategy = "pre-filter"
            fcodes = codes.join(F.broadcast(fids), "vec_id")
            # Selective filter -> scan EVERY list for the (few)
            # surviving codes instead of IVF probe-pruning: the
            # filtered candidate set is already small, so the ADC
            # shortlist misses nothing to nprobe.
            adc = _ivfpq_adc_from(queries, cent, cbq, fcodes, probes=N_CENTROIDS)
            shortlist = (
                adc.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= IVFPQ_REFINE_C)
                .select("query_id", "vec_id")
            )
        else:
            strategy = "post-filter"
            adc = _ivfpq_adc_from(queries, cent, cbq, codes)
            shortlist = (
                adc.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= IVFPQ_REFINE_C * POSTFILTER_INFLATE)
                .drop("rn")
                .join(F.broadcast(fids), "vec_id")
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= IVFPQ_REFINE_C)
                .select("query_id", "vec_id")
            )
        # Exact RE-RANK of the shortlist (the shared refined-serving
        # shape): PQ picks candidates, true distances pick winners.
        topk = _exact_rerank(shortlist, eq, queries, PQ_TOPK).select(
            "query_id", "vec_id"
        )
        # Exact filtered brute-force baseline: the recall self-check.
        fcorpus = eq.join(F.broadcast(fids), "vec_id")
        w_ex = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("vec_id"))
        exact = (
            queries.crossJoin(fcorpus)
            .filter(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id", "vec_id",
                _ivfpq_l2(F.col("qq"), F.col("qemb")).alias("dist"),
            )
            .withColumn("rn", F.row_number().over(w_ex))
            .filter(F.col("rn") <= PQ_TOPK)
            .select("query_id", "vec_id")
        )
        # ONE pass computes n_results AND the recall overlap: `exact`
        # holds at most one row per (query_id, vec_id) (row_number <=
        # k), so a marked left join cannot duplicate topk rows — this
        # replaces two actions that each re-ran the whole ADC+rerank
        # pipeline (guide §1.2: the shortlist pipeline now evaluates
        # once per regime, not twice). The regime/strategy/selectivity
        # columns ride as literals so BOTH regimes' 1-row aggregates
        # union into a single lazy plan — one action at the sink
        # instead of one eager .first() per regime (r14 session 3).
        regime_aggs.append(
            topk.join(
                exact.withColumn("__hit", F.lit(1)),
                ["query_id", "vec_id"],
                "left",
            )
            .agg(
                F.count(F.lit(1)).alias("n_results"),
                F.coalesce(
                    F.sum(F.coalesce(F.col("__hit"), F.lit(0))), F.lit(0)
                ).alias("__ov"),
            )
            .select(
                F.lit(regime).alias("regime"),
                F.lit(strategy).alias("strategy"),
                F.lit(n_pass * 100 / total).alias("selectivity_pct"),
                F.col("n_results"),
                # exact-integer scaling then ONE double divide — the
                # oracle's CAST(COUNT(*) AS DOUBLE) * 100 / N rounding.
                (
                    (F.col("__ov") * 100).cast("double")
                    / F.lit(float(PQ_QUERIES * PQ_TOPK))
                ).alias("recall_vs_exact_pct"),
            )
        )
    return regime_aggs[0].unionByName(regime_aggs[1])


# ---------------------------------------------------------------------------
# Index lifecycle: drift, incremental ingest, retrain, republish
# ---------------------------------------------------------------------------

REFRESH_OFFSET = 1_000_000  #: vec_id offset for the synthetic drift batch
REFRESH_SHIFT = 0.75  #: per-dimension embedding shift of the drift batch
REFRESH_MOD = 10  #: every REFRESH_MOD-th base vector spawns a drifted twin


def _refresh_frames(spark: SparkSession, sf_dir: str):
    """Deterministic drift scenario: 10% of the corpus reappears shifted
    by +REFRESH_SHIFT per dimension under offset ids — a region the
    original centroids never saw. Returns (union, queries, cent_stale,
    cent_new); queries are the PQ_QUERIES lowest drifted ids (new data
    is what gets searched next)."""
    e0 = load_table(spark, sf_dir, "embeddings")
    base = e0.select("vec_id", _quantize(F.col("embedding")).alias("qemb"))
    drift = e0.filter(F.col("vec_id") % REFRESH_MOD == 0).select(
        (F.col("vec_id") + REFRESH_OFFSET).alias("vec_id"),
        _quantize(
            F.expr(f"transform(embedding, x -> cast(x as double) + {REFRESH_SHIFT}d)")
        ).alias("qemb"),
    )
    union = base.unionByName(drift)
    queries = drift.orderBy("vec_id").limit(PQ_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qemb").alias("qq")
    )
    cent_stale = base.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("qemb").alias("cemb")
    )
    half = N_CENTROIDS // 2
    cent_new = union.filter(
        (F.col("vec_id") < half)
        | (
            (F.col("vec_id") >= REFRESH_OFFSET)
            & (F.col("vec_id") < REFRESH_OFFSET + REFRESH_MOD * half)
        )
    ).select(F.col("vec_id").cast("int").alias("cid"), F.col("qemb").alias("cemb"))
    return union, queries, cent_stale, cent_new


def _refresh_index_root(sf_dir: str) -> str:
    import os
    import tempfile

    tag = sf_dir.strip("/").replace("/", "_")
    return os.path.join(
        tempfile.gettempdir(), "argodb_mapreduce_spark", tag, "ivfpq_refresh"
    )


def _ensure_refresh_index(spark: SparkSession, sf_dir: str) -> str:
    """Persist the full index LIFECYCLE as versioned-table history:

    * cent/cbq v0  = the stale index (base corpus, original centroids);
    * codes  v0    = base codes under the stale index;
    * codes  v1    = + the drift batch encoded with the STALE artifacts
                     (manifest-only append — the daily-ingest path);
    * cent/cbq v1, codes v2 = the RETRAIN: centroids re-seeded to cover
                     the drifted region, whole corpus re-encoded,
                     republished as new versions (old versions stay
                     time-travelable, exactly like any snapshot table).
    """
    from argodb_mapreduce_spark.catalog import table_path
    from argodb_mapreduce_spark.sources.versioned import versioned_write

    root = _refresh_index_root(sf_dir)

    def build():
        import os
        import shutil

        union, _q, cent_stale, cent_new = _refresh_frames(spark, sf_dir)
        cbq_s, codes_s = _ivfpq_encode_from(union, cent_stale)
        base_codes = codes_s.filter(F.col("vec_id") < REFRESH_OFFSET)
        drift_codes = codes_s.filter(F.col("vec_id") >= REFRESH_OFFSET)
        cbq_n, codes_n = _ivfpq_encode_from(union, cent_new)
        for name in ("cent", "cbq", "codes"):
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
        versioned_write(cent_stale, os.path.join(root, "cent"), mode="overwrite")
        versioned_write(cbq_s, os.path.join(root, "cbq"), mode="overwrite")
        versioned_write(base_codes, os.path.join(root, "codes"), mode="overwrite")
        versioned_write(drift_codes, os.path.join(root, "codes"), mode="append")
        versioned_write(cent_new, os.path.join(root, "cent"), mode="overwrite")
        versioned_write(cbq_n, os.path.join(root, "cbq"), mode="overwrite")
        versioned_write(codes_n, os.path.join(root, "codes"), mode="overwrite")

    _locked_build(root, table_path(sf_dir, "embeddings"), build)
    return root


_SQL_REFRESH = f"""
    WITH qv AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * {float(_Q)}) AS BIGINT)) AS qemb
      FROM embeddings
    ), dv AS (
      SELECT vec_id + {REFRESH_OFFSET} AS vec_id,
             list_transform(embedding,
               x -> CAST(ROUND((CAST(x AS DOUBLE) + {REFRESH_SHIFT}) * {float(_Q)}) AS BIGINT)) AS qemb
      FROM embeddings WHERE vec_id % {REFRESH_MOD} = 0
    ), uv AS (
      SELECT vec_id, qemb FROM qv UNION ALL SELECT vec_id, qemb FROM dv
    ), qrs AS (
      SELECT vec_id AS query_id, qemb FROM dv ORDER BY vec_id LIMIT {PQ_QUERIES}
    ), cent_s AS (
      SELECT CAST(vec_id AS INT) AS cid, qemb AS cemb FROM qv WHERE vec_id < {N_CENTROIDS}
    ), cent_n AS (
      SELECT CAST(vec_id AS INT) AS cid, qemb AS cemb FROM uv
      WHERE vec_id < {N_CENTROIDS // 2}
         OR (vec_id >= {REFRESH_OFFSET}
             AND vec_id < {REFRESH_OFFSET + REFRESH_MOD * (N_CENTROIDS // 2)})
    ), gt AS (
      SELECT query_id, vec_id FROM (
        SELECT q.query_id, v.vec_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                                  ORDER BY {_sql_l2("q.qemb", "v.qemb", _PQ_DIMS)}, v.vec_id) AS rn
        FROM qrs q CROSS JOIN uv v WHERE v.vec_id <> q.query_id
      ) WHERE rn <= {PQ_TOPK}
    ), {_sql_ivfpq_block("_s", "uv", "cent_s", "qrs")},
    {_sql_ivfpq_block("_n", "uv", "cent_n", "qrs")},
    top_s AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_dist, vec_id) AS rn
        FROM adc_s
      ) WHERE rn <= {PQ_TOPK}
    ), top_n AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_dist, vec_id) AS rn
        FROM adc_n
      ) WHERE rn <= {PQ_TOPK}
    ), ov_s AS (
      SELECT t.query_id, CAST(COUNT(*) AS BIGINT) AS hits
      FROM top_s t JOIN gt g ON g.query_id = t.query_id AND g.vec_id = t.vec_id
      GROUP BY t.query_id
    ), ov_n AS (
      SELECT t.query_id, CAST(COUNT(*) AS BIGINT) AS hits
      FROM top_n t JOIN gt g ON g.query_id = t.query_id AND g.vec_id = t.vec_id
      GROUP BY t.query_id
    )
    SELECT q.query_id,
           CAST(COALESCE(s.hits, 0) AS BIGINT) AS hits_stale,
           CAST(COALESCE(n.hits, 0) AS BIGINT) AS hits_retrained,
           COALESCE(s.hits, 0) / {float(PQ_TOPK)} AS recall_stale,
           COALESCE(n.hits, 0) / {float(PQ_TOPK)} AS recall_retrained
    FROM qrs q
    LEFT JOIN ov_s s ON s.query_id = q.query_id
    LEFT JOIN ov_n n ON n.query_id = q.query_id
"""


@register(
    "similarity_index_refresh",
    oracle=_SQL_REFRESH,
    tags=("similarity", "vector", "ann", "index", "lifecycle"),
    doc=(
        f"ANN index LIFECYCLE: 10% of the corpus drifts into a region "
        f"the original {N_CENTROIDS} centroids never saw; the drift "
        f"batch is ingested incrementally (encoded with the STALE "
        f"centroids/codebook, appended to the code table as a "
        f"manifest-only new version), then the index is RETRAINED "
        f"(centroids re-seeded to cover the drifted region, corpus "
        f"re-encoded, republished as new table versions — old versions "
        f"stay time-travelable). Output: per drifted query, recall@"
        f"{PQ_TOPK} vs the exact ground truth under the stale index "
        f"(drops to ~0 — huge residuals overflow the PQ codebook) and "
        f"under the retrained one (recovers to 0.5-0.8). Both searches "
        f"run FROM THE PERSISTED version-pinned artifacts; the oracle "
        f"hash-checks every per-query recall value."
    ),
)
def similarity_index_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale design: retrain cost equals one encode pass (the same
    O(n·k) blocked assignment the build paid), and the republish is
    atomic via the manifest — searches either see the old index or the
    new one, never a half-retrained mix. Recall monitoring like this
    query's before/after columns is exactly the signal a production
    vector lake uses to schedule retrains."""
    import os

    from argodb_mapreduce_spark.sources.versioned import snapshot_read

    root = _ensure_refresh_index(spark, sf_dir)
    union, queries, _cs, _cn = _refresh_frames(spark, sf_dir)

    # exact ground truth over the full (post-drift) corpus
    gt = (
        queries.crossJoin(union)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", _ivfpq_l2(F.col("qq"), F.col("qemb")).alias("d"))
    )
    w_gt = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("vec_id"))
    gt10 = (
        gt.withColumn("rn", F.row_number().over(w_gt))
        .filter(F.col("rn") <= PQ_TOPK)
        .select("query_id", "vec_id")
    )

    w_top = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("vec_id"))

    def hits_from(cent_v, cbq_v, codes_v, out: str) -> DataFrame:
        cent = snapshot_read(spark, os.path.join(root, "cent"), cent_v)
        cbq = snapshot_read(spark, os.path.join(root, "cbq"), cbq_v)
        codes = snapshot_read(spark, os.path.join(root, "codes"), codes_v)
        adc = _ivfpq_adc_from(queries, cent, cbq, codes)
        top = (
            adc.withColumn("rn", F.row_number().over(w_top))
            .filter(F.col("rn") <= PQ_TOPK)
            .select("query_id", "vec_id")
        )
        return (
            top.join(gt10, ["query_id", "vec_id"])
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias(out))
        )

    # stale = version-pinned reads: cent/cbq v0, codes v1 (base + ingest)
    stale = hits_from(0, 0, 1, "hits_stale")
    # retrained = latest versions (cent/cbq v1, codes v2)
    fresh = hits_from(None, None, None, "hits_retrained")
    return (
        queries.select("query_id")
        .join(stale, "query_id", "left")
        .join(fresh, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("hits_stale", F.lit(0)).cast("long").alias("hits_stale"),
            F.coalesce("hits_retrained", F.lit(0)).cast("long").alias("hits_retrained"),
            (F.coalesce("hits_stale", F.lit(0)) / F.lit(float(PQ_TOPK))).alias("recall_stale"),
            (F.coalesce("hits_retrained", F.lit(0)) / F.lit(float(PQ_TOPK))).alias(
                "recall_retrained"
            ),
        )
    )
