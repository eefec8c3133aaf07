"""Property-based tests (hypothesis) for the engine's pure logic.

SURVEY.md §5 notes the reference ships no tests at all; beyond the
oracle-differential suite, these pin down the engine-exactness
invariants the whole oracle strategy rests on, plus the scan-filter
parser's round-trip behavior.
"""

from __future__ import annotations

import decimal
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from argodb_mapreduce_spark.catalog import parse_filter


@given(
    col=st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,20}", fullmatch=True),
    value=st.text(
        alphabet=st.characters(blacklist_characters='"=\n\r', min_codepoint=32, max_codepoint=126), max_size=20
    ).map(str.strip),
)
def test_parse_filter_quoted_equals_bare(col, value):
    # ArgodbSerdeUtils.java:18-26 — col="v" ≡ col=v (quotes additionally
    # protect surrounding whitespace, which bare values cannot carry).
    bare = parse_filter(f"{col}={value}")
    quoted = parse_filter(f'{col}="{value}"')
    assert bare == quoted == (col, value)


@given(
    xs=st.lists(
        st.floats(min_value=-1e5, max_value=1e5, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=200,
    )
)
def test_decimal_sum_is_order_independent(xs):
    """The oracle_safe invariant: per-value decimal(18,4) quantization
    then exact summation gives the same result in ANY order — unlike
    float summation."""

    def dec_sum(values):
        return sum(decimal.Decimal(v).quantize(decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP) for v in values)

    forward = dec_sum(xs)
    backward = dec_sum(list(reversed(xs)))
    assert forward == backward


@given(
    xs=st.lists(
        st.floats(min_value=-0.999, max_value=0.999, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=64,
    )
)
def test_quantized_dot_is_blas_exact(xs):
    """The similarity invariant: with |q| < 2^22 the float64 matmul path
    equals exact integer arithmetic regardless of summation order."""
    import numpy as np

    q = np.array([round(float(np.float64(x)) * (1 << 20)) for x in xs], dtype="int64")
    assert np.abs(q).max(initial=0) < (1 << 22)
    exact = int(sum(int(a) * int(a) for a in q))
    via_float = float(q.astype("float64") @ q.astype("float64"))
    assert via_float == float(exact)
    assert int(via_float) == exact


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 10_000), st.booleans()),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=25, deadline=None)
def test_asof_join_matches_bruteforce(rows):
    """asof_join semantics vs an O(n²) reference implementation, on
    random (key, ts, is_left) streams (pure-Python model check of the
    union+window formulation's ordering rules)."""
    lefts = [(k, t) for k, t, is_l in rows if is_l]
    rights = [(k, t) for k, t, is_l in rows if not is_l]

    # model of asof_join: most recent right with ts_r <= ts_l, same key;
    # ties inside right broken by larger ts (then arbitrary-but-fixed).
    def brute(k, t):
        cands = [rt for rk, rt in rights if rk == k and rt <= t]
        return max(cands) if cands else None

    # union+window model: sort (ts, side) per key, carry last right ts.
    out = {}
    for k in {k for k, _ in lefts}:
        seq = sorted(
            [(t, 0, t) for rk, t in rights if rk == k] + [(t, 1, t) for lk, t in lefts if lk == k]
        )
        last_right = None
        for t, side, _ in seq:
            if side == 0:
                last_right = t
            else:
                out.setdefault((k, t), last_right)
    for k, t in lefts:
        assert out[(k, t)] == brute(k, t)
