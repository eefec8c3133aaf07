"""Sampling operators for training-data curation (SURVEY.md §2.C ext).

Large-scale pipeline staples: stratified sampling (class-balanced
subsets), deterministic per-group top-k sampling (reproducible
downsampling of over-represented groups), and seeded Bernoulli
sampling (fn_sample_selfcheck in functions/scalar.py).

Engine RNGs differ, so the oracle strategy splits in two:
* ``sample_stratified`` exposes *statistical* contract columns
  (per-stratum counts + bounds flags) — the sampled rows themselves are
  engine-specific;
* ``sample_pergroup_topk`` is **exactly** reproducible across engines:
  the "random" order is md5(key) — deterministic, uniform-ish, and
  identical in Spark and DuckDB — so the selected rows hash-match
  exactly. This is the shape to use when a training run must be
  re-creatable bit-for-bit from the corpus.

Both are one shuffle (sampleBy is shuffle-free; the top-k is a window
over the group key) and stream at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from argodb_mapreduce_spark.catalog import load_table
from argodb_mapreduce_spark.registry import register

#: Per-class sampling fractions for the stratified demo.
STRATA_FRACTIONS = {"N": 0.1, "R": 0.3, "A": 0.5}


@register(
    "sample_stratified",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_stratum,
           TRUE AS fraction_ok
    FROM lineitem
    WHERE l_returnflag IN ('N', 'R', 'A')
    GROUP BY l_returnflag
    """,
    tags=("sample", "stratified", "approx"),
    doc=(
        "Stratified (per-class) sampling via sampleBy: each l_returnflag "
        "stratum is Bernoulli-sampled at its own rate (0.1/0.3/0.5) — "
        "the class-rebalancing primitive of corpus curation. Map-only, "
        "no shuffle for the sample itself. Contract columns are the "
        "stratum sizes and a binomial-bounds flag (engine RNGs differ, "
        "SURVEY.md §5.3); one lazy plan, no driver-side counts."
    ),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = li.sampleBy("l_returnflag", STRATA_FRACTIONS, seed=42)
    sampled = s.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_sampled"))
    source = li.filter(F.col("l_returnflag").isin(*STRATA_FRACTIONS)).groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_stratum")
    )
    frac = F.create_map(*[F.lit(x) for kv in STRATA_FRACTIONS.items() for x in kv])
    return (
        source.join(sampled, "l_returnflag", "left")
        .select(
            "l_returnflag",
            "n_stratum",
            (
                F.abs(
                    F.coalesce(F.col("n_sampled"), F.lit(0)) / F.col("n_stratum")
                    - frac[F.col("l_returnflag")]
                )
                < 0.05
            ).alias("fraction_ok"),
        )
    )


@register(
    "sample_pergroup_topk",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber
    FROM (
      SELECT l_returnflag, l_orderkey, l_linenumber,
             ROW_NUMBER() OVER (
               PARTITION BY l_returnflag
               ORDER BY md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)) ASC
             ) AS rn
      FROM lineitem
    ) t
    WHERE rn <= 100
    """,
    tags=("sample", "deterministic"),
    doc=(
        "Deterministic per-group k-sample: rows ordered by md5 of their "
        "key (uniform-ish, engine-identical) and the first k per group "
        "kept — reproducible downsampling of over-represented classes, "
        "exact-hash-checkable unlike RNG sampling. One shuffle (window "
        "over the group key); at cluster scale a pre-aggregated partial "
        "top-k per partition feeds the window (rank pushdown via "
        "WindowGroupLimit in Spark's plan)."
    ),
)
def sample_pergroup_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rand_key = F.md5(
        F.concat_ws("-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string"))
    )
    w = Window.partitionBy("l_returnflag").orderBy(rand_key.asc())
    return (
        li.select("l_returnflag", "l_orderkey", "l_linenumber", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 100)
        .select("l_returnflag", "l_orderkey", "l_linenumber")
    )


#: Target mixture for data_mixture_sample: keep-rate (in basis points of
#: 10000) per source bucket. A training run re-weights corpora by
#: source; rates here split sources into three tiers so every tier is
#: exercised. Derived deterministically from the source suffix so the
#: DuckDB oracle can replicate as a CASE expression.
MIXTURE_BPS = {0: 10000, 1: 5000, 2: 2500}


def _mixture_tier_sql() -> str:
    # TRY_CAST + full-suffix substring, mirroring the Spark side exactly:
    # a non-numeric suffix is NULL (→ ELSE tier) in BOTH engines, and
    # suffixes longer than 10 chars agree too (VERDICT r3 wrong-item 2).
    return "TRY_CAST(SUBSTRING(source, 4) AS INT) % 3"


@register(
    "data_mixture_sample",
    oracle=f"""
    WITH tagged AS (
      SELECT doc_id, source, {_mixture_tier_sql()} AS tier,
             CAST(('0x' || SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS bucket
      FROM documents
    ),
    kept AS (
      SELECT * FROM tagged
      WHERE bucket < CASE tier WHEN 0 THEN {MIXTURE_BPS[0]} WHEN 1 THEN {MIXTURE_BPS[1]} ELSE {MIXTURE_BPS[2]} END
    )
    SELECT source,
           CAST((SELECT COUNT(*) FROM tagged t WHERE t.source = kept.source) AS BIGINT) AS n_total,
           CAST(COUNT(*) AS BIGINT) AS n_kept
    FROM kept GROUP BY source
    """,
    tags=("sampling", "curation", "mixture"),
    doc=(
        "Deterministic data-mixture resampling: every source is assigned "
        "a keep-rate tier (full / half / quarter) and rows are kept by "
        "md5(doc_id) mod 10000 < rate — a content-independent, "
        "engine-independent Bernoulli that makes the *exact same* "
        "training mixture reproducible from the raw corpus on any "
        "engine, any partitioning, any day. One shuffle (the per-source "
        "count aggregate); the keep-filter itself is map-side. This is "
        "the re-weighting step of a corpus mixing pipeline (e.g. "
        "up/down-weighting web vs books vs code shards)."
    ),
)
def data_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # try_cast of the ENTIRE suffix (no length cap): NULL for non-numeric
    # source names instead of an ANSI cast error, matching the oracle's
    # TRY_CAST. NULL tier falls through to the otherwise() rate — same as
    # the SQL CASE's ELSE branch.
    tier = (F.expr("try_cast(substring(source, 4) AS int)") % 3).alias("tier")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("long") % 10000
    )
    rate = (
        F.when(F.col("tier") == 0, F.lit(MIXTURE_BPS[0]))
        .when(F.col("tier") == 1, F.lit(MIXTURE_BPS[1]))
        .otherwise(F.lit(MIXTURE_BPS[2]))
    )
    tagged = d.select("doc_id", "source", tier, bucket.alias("bucket"))
    totals = tagged.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    kept = tagged.filter(F.col("bucket") < rate).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept")
    )
    return totals.join(kept, "source").select("source", "n_total", "n_kept")


#: Price at (or above) which an order is always kept; the keep
#: probability is o_totalprice / WEIGHTED_P_MAX, clamped to 1.
WEIGHTED_P_MAX = 400000.0


def _weighted_sql() -> str:
    from argodb_mapreduce_spark.functions.oracle_safe import sql_dsum

    return f"""
    WITH tagged AS (
      SELECT o_orderpriority, o_totalprice,
             CAST(('0x' || SUBSTRING(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS bucket,
             CAST(FLOOR(10000 * LEAST(o_totalprice / {WEIGHTED_P_MAX!r}, CAST(1 AS DOUBLE))) AS BIGINT) AS threshold
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (WHERE bucket < threshold) AS BIGINT) AS n_kept,
           {sql_dsum("CASE WHEN bucket < threshold THEN o_totalprice END")} AS kept_value
    FROM tagged GROUP BY o_orderpriority
    """


@register(
    "sample_weighted_bernoulli",
    oracle=_weighted_sql(),
    tags=("sampling", "curation"),
    doc=(
        "Deterministic importance sampling: each order is kept with "
        "probability proportional to its value (o_totalprice / "
        f"{WEIGHTED_P_MAX:.0f}, clamped to 1), decided by md5(o_orderkey) "
        "mod 10000 against a per-row integer threshold. The same "
        "hash-vs-threshold trick as the mixture sampler, but with a "
        "per-row weight instead of a per-source tier — the standard "
        "quality-weighted downsampling step of a curation pipeline "
        "(keep high-value documents, thin the tail), reproducible on "
        "any engine / partitioning. Entirely map-side except the final "
        "per-priority summary aggregate."
    ),
)
def sample_weighted_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    from argodb_mapreduce_spark.functions.oracle_safe import dsum

    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long") % 10000
    )
    # FLOOR (not cast-truncate) on both sides: DuckDB's double->BIGINT
    # cast rounds-to-nearest while Spark's truncates, so the threshold
    # must be floored explicitly before the integer compare.
    threshold = F.floor(
        F.lit(10000)
        * F.least(F.col("o_totalprice") / F.lit(WEIGHTED_P_MAX), F.lit(1.0))
    ).cast("long")
    tagged = o.select(
        "o_orderpriority",
        "o_totalprice",
        bucket.alias("bucket"),
        threshold.alias("threshold"),
    )
    kept = F.col("bucket") < F.col("threshold")
    return tagged.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(kept, 1)).alias("n_kept"),
        dsum(F.when(kept, F.col("o_totalprice"))).alias("kept_value"),
    )


# ---------------------------------------------------------------------------
# Weighted reservoir sampling per group (Efraimidis–Spirakis A-ES)
# ---------------------------------------------------------------------------

#: Reservoir size per group.
RESERVOIR_K = 5

#: Grid bits for the A-ES key (see functions/oracle_safe.py: the key
#: goes through ln(), whose last-ulp rounding is engine-specific, so it
#: is snapped to the 2^-40 grid before ranking — near-ties become exact
#: ties resolved by the unique-key tie-break, identically everywhere).
_AES_GRID = float(1 << 40)


def _aes_sql() -> str:
    return f"""
    WITH keyed AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROUND(LN((CAST(('0x' || SUBSTRING(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 + 0.5)
                      / 10000.0)
                   / o_totalprice * {_AES_GRID!r}) AS key_grid
      FROM orders
    ),
    ranked AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY key_grid DESC, o_orderkey) AS rank
      FROM keyed
    )
    SELECT o_orderpriority, CAST(rank AS INT) AS rank,
           CAST(o_orderkey AS BIGINT) AS o_orderkey, o_totalprice
    FROM ranked WHERE rank <= {RESERVOIR_K}
    """


@register(
    "sample_weighted_reservoir",
    oracle=_aes_sql(),
    tags=("sampling", "curation", "topk"),
    doc=(
        "Weighted reservoir sampling per group (Efraimidis-Spirakis "
        "A-ES): each row draws a deterministic uniform u from "
        "md5(o_orderkey) and ranks by u^(1/w) — realized as "
        "ln(u)/o_totalprice snapped to the 2^-40 grid so the ln() "
        "last-ulp never flips a rank across engines — and the top-"
        f"{RESERVOIR_K} per priority ARE a weighted sample without "
        "replacement. This is THE distributed weighted-sampling "
        "algorithm: key assignment is map-side, selection is one "
        "top-k-per-group window (partial TakeOrdered per partition, "
        "no global sort), and reservoirs from disjoint splits merge by "
        "just keeping the k best keys — the mergeability that makes it "
        "work on a 1000-executor scan."
    ),
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: O(n) key computation in codegen + one k-bounded window
    per group; merging partial reservoirs is an associative top-k, so
    a 100 TB scan never materializes more than k rows per group per
    partition."""
    o = load_table(spark, sf_dir, "orders")
    u = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long") % 10000
        + F.lit(0.5)
    ) / F.lit(10000.0)
    key_grid = F.round(F.log(u) / F.col("o_totalprice") * F.lit(_AES_GRID))
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("key_grid"), "o_orderkey"
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            key_grid.alias("key_grid"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= RESERVOIR_K)
        .select(
            "o_orderpriority",
            F.col("rank").cast("int"),
            F.col("o_orderkey").cast("long"),
            "o_totalprice",
        )
    )
