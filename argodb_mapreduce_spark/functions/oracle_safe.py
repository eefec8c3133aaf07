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
