"""Hypothesis property tests for the pure-Python contract functions.

These run without a SparkSession, so hundreds of generated examples are
cheap. They pin the reference-compat behaviors that the example-based
tests only spot-check: filter parsing (ArgodbSerdeUtils semantics),
range-bucket assignment (must agree with bisect), and fixture staleness.
"""

from __future__ import annotations

import os
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from argodb_mapreduce_spark.catalog import ScanError, fixture_stale, parse_filter

_IDENT = st.from_regex(re.compile(r"[A-Za-z_][A-Za-z0-9_]*"), fullmatch=True)
#: Values the reference's filter grammar accepts: anything without
#: leading/trailing whitespace (the parser strips around '=').
_VALUE = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\n\r"),
    min_size=1,
    max_size=40,
).filter(lambda s: s == s.strip() and "=" not in s)


@given(col=_IDENT, value=_VALUE)
@settings(max_examples=200)
def test_parse_filter_roundtrip(col, value):
    c, v = parse_filter(f"{col}={value}")
    assert c == col
    # Quote-strip: a fully double-quoted value loses exactly one pair of
    # quotes (ArgodbSerdeUtils.getFilterStringValue); others are verbatim.
    if len(value) >= 2 and value.startswith('"') and value.endswith('"'):
        assert v == value[1:-1]
    else:
        assert v == value


@given(col=_IDENT, value=_VALUE)
@settings(max_examples=100)
def test_parse_filter_quoted_equals_bare(col, value):
    if value.startswith('"') or value.endswith('"'):
        return
    assert parse_filter(f'{col}="{value}"') == parse_filter(f"{col}={value}")


@given(col=_IDENT, value=_VALUE, pad=st.sampled_from(["", " ", "  ", "\t"]))
@settings(max_examples=100)
def test_parse_filter_whitespace_insensitive(col, value, pad):
    assert parse_filter(f"{pad}{col}{pad}={pad}{value}{pad}") == parse_filter(f"{col}={value}")


@given(s=st.text(max_size=30))
@settings(max_examples=200)
def test_parse_filter_never_crashes_differently(s):
    """Any input either parses to (identifier, value) or raises ScanError
    — never IndexError/AttributeError/etc."""
    try:
        col, _ = parse_filter(s)
    except ScanError:
        return
    assert re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", col)


@given(
    value=st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    bounds=st.lists(st.floats(min_value=-1e5, max_value=1e5, allow_nan=False), min_size=1, max_size=6, unique=True),
)
@settings(max_examples=200)
def test_range_bucket_matches_bisect(value, bounds):
    """The codegen'd range_id (count of bounds <= value) must equal the
    bisect the read path uses for pruned interval lookups."""
    import bisect

    bounds = tuple(sorted(bounds))
    expected = bisect.bisect_right(bounds, value)
    # Pure-Python twin of range_partitions._bucket_expr's when-chain.
    got = sum(1 for b in bounds if value >= b)
    assert got == expected


def test_fixture_stale_ordering(tmp_path):
    src = tmp_path / "src.parquet"
    marker = tmp_path / "_SUCCESS"
    src.write_text("x")
    assert fixture_stale(str(src), str(marker))  # marker missing
    marker.write_text("ok")
    os.utime(marker, (os.path.getmtime(str(src)) + 10,) * 2)
    assert not fixture_stale(str(src), str(marker))  # marker newer
    os.utime(src, (os.path.getmtime(str(marker)) + 10,) * 2)
    assert fixture_stale(str(src), str(marker))  # source regenerated
