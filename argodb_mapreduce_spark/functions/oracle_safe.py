"""Aggregation helpers that are bit-identical across engines.

The driver compares every query against a DuckDB oracle with an
order-insensitive *value hash* — so floating-point aggregates must be
bit-identical, not merely close. Summing doubles is order-dependent
(Spark's partial aggregation vs DuckDB's sequential scan differ in the
last ulp), so the engine's convention for oracle-checked aggregates is:

1. each row's double expression is computed in IEEE double (same bits
   in any engine given the same inputs and the same association order);
2. the row value is cast to an exact DECIMAL(18, s) — ties at the
   rounding digit are impossible for binary doubles at s >= 1, so both
   engines round to the same decimal;
3. the DECIMAL values are summed exactly (order-independent);
4. the exact sum is cast back to DOUBLE (deterministic nearest-even),
   so the output schema is plain DOUBLE on both sides.

Averages are an exact decimal sum divided by a bigint count, both in
double — again deterministic. This costs one decimal conversion per row
(still whole-stage-codegen'd JVM-side) and buys exactness at any
parallelism — the property also holds on a 1000-executor cluster.

Why not int64 "cents"? Scaled-integer sums would be ~2× faster locally
but overflow: a 100 TB fact table summing µ-scaled prices reaches
~7e20 >> 2^63. decimal(38) has 18 orders of magnitude of headroom —
the scale-safe representation (SCALING.md).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_SCALE = 4


def _dec(scale: int) -> str:
    return f"decimal(18,{scale})"


def dsum(col: Column | str, scale: int = DEFAULT_SCALE) -> Column:
    """Order-independent double sum: exact decimal sum cast to double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_dec(scale))).cast("double")


def davg(col: Column | str, scale: int = DEFAULT_SCALE) -> Column:
    """Order-independent double average: exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_dec(scale))).cast("double") / F.count(c)


def sql_dsum(expr: str, scale: int = DEFAULT_SCALE) -> str:
    """DuckDB twin of :func:`dsum` for oracle_sql strings.

    The decimal→double conversion goes via VARCHAR: DuckDB's direct
    decimal→double cast double-rounds (int128 → double, then scale
    division) and drifts one ulp once the scaled integer exceeds 2^53,
    while string→double parsing is correctly rounded — matching Spark's
    BigDecimal.doubleValue exactly at any magnitude.
    """
    return f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS VARCHAR) AS DOUBLE)"


def sql_davg(expr: str, scale: int = DEFAULT_SCALE) -> str:
    """DuckDB twin of :func:`davg`."""
    return f"{sql_dsum(expr, scale)} / COUNT({expr})"


# ---------------------------------------------------------------------------
# Power-of-two-grid sums: the exact pattern for IRRATIONAL doubles.
# ---------------------------------------------------------------------------
# The decimal cast above is bit-safe only when the TRUE value lies on a
# coarse decimal grid (prices, 2-decimal measures): the double sits
# ~1e-16 from the grid point, far from the rounding boundary at the
# cast scale. For irrational per-row values (ratios, products of
# ratios, anything through sqrt/division) the value is uniform over the
# rounding interval, and DuckDB's double->decimal cast DOUBLE-ROUNDS
# (scale by 10^s in double — itself a rounded op with ulp(v*10^s)
# error — then round), while Spark's BigDecimal cast rounds the
# shortest decimal representation: near a boundary the two can differ
# by one decimal ulp (observed: embedding_normalize_stats at sf0.01).
#
# Scaling by 2^bits instead is EXACT in double (exponent shift only),
# so ROUND sees bit-identical values in both engines; half-ties agree
# (Spark HALF_UP == C round(): both away from zero). The rounded grid
# values sum exactly in decimal(38,0)/HUGEINT, and the final
# /2^bits is an exact power-of-two division. Quantization error is
# 2^-bits per row (1e-12 at the default 40 bits) — deterministic and
# identical on both sides, which is the property that matters.

GRID_BITS = 40


def _grid(bits: int) -> float:
    return float(1 << bits)


def gsum(col: Column | str, bits: int = GRID_BITS) -> Column:
    """Order-independent double sum for irrational per-row values."""
    c = F.col(col) if isinstance(col, str) else col
    g = _grid(bits)
    return F.sum(F.round(c * F.lit(g)).cast("decimal(38,0)")).cast("double") / F.lit(g)


def gavg(col: Column | str, bits: int = GRID_BITS) -> Column:
    """Order-independent double average on the 2^-bits grid."""
    c = F.col(col) if isinstance(col, str) else col
    g = _grid(bits)
    return (
        F.sum(F.round(c * F.lit(g)).cast("decimal(38,0)")).cast("double") / F.lit(g)
    ) / F.count(c)


def sql_gsum(expr: str, bits: int = GRID_BITS) -> str:
    """DuckDB twin of :func:`gsum` (VARCHAR hop: HUGEINT->DOUBLE direct
    would double-round past 2^53, string parse is correctly rounded)."""
    g = _grid(bits)
    # Self-parenthesized: the expansion ends in "/ 2^bits", so an
    # unwrapped result used as a DIVISOR ("X / {gsum}") would parse as
    # (X / sum) / grid — off by the grid factor (caught building
    # orders_ols_trend's cov/var ratio).
    return (
        f"(CAST(CAST(SUM(CAST(ROUND(({expr}) * {g!r}) AS BIGINT)) AS VARCHAR) AS DOUBLE)"
        f" / {g!r})"
    )


def sql_gavg(expr: str, bits: int = GRID_BITS) -> str:
    """DuckDB twin of :func:`gavg`."""
    return f"{sql_gsum(expr, bits)} / COUNT({expr})"


def multiset_equal_frame(a, b, name: str):
    """LAZY twin of :func:`multiset_equal`: a 1-row DataFrame holding
    the equality flag as column ``name``, for folding the proof into a
    result plan via ``result.crossJoin(F.broadcast(frame))`` instead of
    collecting it eagerly (r15, guide §1.2/§2.4): the eager form costs
    a separate job — and a separate evaluation of any input the result
    plan scans again — where the folded form runs the same one-pass
    union aggregate inside the single action. Empty-on-both-sides
    compares equal, matching exceptAll semantics."""
    cols = list(a.columns)
    tagged = a.select(*cols).withColumn("__w", F.lit(1)).unionAll(
        b.select(*cols).withColumn("__w", F.lit(-1))
    )
    return (
        tagged.groupBy(*cols)
        .agg(F.sum("__w").alias("__d"))
        .agg(
            (
                F.coalesce(
                    F.sum(F.when(F.col("__d") != 0, F.lit(1)).otherwise(F.lit(0))),
                    F.lit(0),
                )
                == 0
            ).alias(name)
        )
    )


def multiset_equal(a, b) -> bool:
    """One-pass multiset equality of two DataFrames over ``a``'s columns.

    Equivalent to ``a.exceptAll(b).isEmpty and b.exceptAll(a).isEmpty``
    (per-value row counts must agree; group keys treat NULL == NULL,
    matching exceptAll's multiset semantics) but runs as a SINGLE
    aggregation over a union — each side is computed once and shuffled
    once, where the two exceptAll passes evaluate both inputs twice and
    shuffle four times (guide §2.4: remove shuffles outright). Used by
    the oracle-pinned incremental-equals-full self-checks."""
    cols = list(a.columns)
    tagged = a.select(*cols).withColumn("__w", F.lit(1)).unionAll(
        b.select(*cols).withColumn("__w", F.lit(-1))
    )
    diff = (
        tagged.groupBy(*cols)
        .agg(F.sum("__w").alias("__d"))
        .filter(F.col("__d") != 0)
    )
    return diff.limit(1).count() == 0
