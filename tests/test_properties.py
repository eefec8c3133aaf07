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


# ---------------------------------------------------------------------------
# Round-4 additions: broader parse_filter coverage, range buckets, staleness.
# ---------------------------------------------------------------------------

import os
import re

from argodb_mapreduce_spark.catalog import ScanError, fixture_stale

_IDENT = st.from_regex(re.compile(r"[A-Za-z_][A-Za-z0-9_]*"), fullmatch=True)
#: Anything without surrounding whitespace or '=' (the parser strips
#: around '=' and splits on the first '=').
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
    # quotes (ArgodbSerdeUtils.getFilterStringValue); others verbatim.
    if len(value) >= 2 and value.startswith('"') and value.endswith('"'):
        assert v == value[1:-1]
    else:
        assert v == value


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
    bounds=st.lists(
        st.floats(min_value=-1e5, max_value=1e5, allow_nan=False), min_size=1, max_size=6, unique=True
    ),
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


# ---------------------------------------------------------------------------
# Round-5: shingle document-frequency ceiling (inverted-index join guard).
# ---------------------------------------------------------------------------


def test_hot_shingle_excluded_from_join_input(spark):
    """A stop-shingle above the df ceiling must vanish from the shingle
    universe (it would otherwise contribute df^2 rows to ONE reducer of
    the self-join); rare shingles and doc coverage must survive."""
    from pyspark.sql import functions as F

    from argodb_mapreduce_spark.operators.dedup import cap_shingle_df

    rows = [(d, "the quick brown") for d in range(10)]  # df=10 hot key
    rows += [(d, f"rare shingle {d}") for d in range(10)]  # df=1 each
    sh = spark.createDataFrame(rows, "doc_id int, shingle string")

    capped = cap_shingle_df(sh, max_df=5)
    left = {(r["doc_id"], r["shingle"]) for r in capped.collect()}
    assert all(s != "the quick brown" for _, s in left)
    assert left == {(d, f"rare shingle {d}") for d in range(10)}
    # Join input shrank from df^2=100 hot pairs to zero; self-join sanity:
    pairs = (
        capped.alias("a")
        .join(
            capped.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .count()
    )
    assert pairs == 0

    # Ceiling above every df: identity (the fixture-default regime).
    uncapped = {(r["doc_id"], r["shingle"]) for r in cap_shingle_df(sh, max_df=1000).collect()}
    assert uncapped == {(d, s) for d, s in rows}
    # None disables the cap entirely.
    assert cap_shingle_df(sh, max_df=None) is sh


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


def test_grid_sum_cross_engine_boundary_values(spark):
    """oracle_safe.gsum/gavg must be bit-identical between Spark and
    DuckDB even for values engineered to sit near rounding boundaries —
    the adversarial case where the decimal(18,s) cast pattern diverged
    (DuckDB double->decimal double-rounds; caught at sf0.01 in
    embedding_normalize_stats). The grid helpers scale by 2^40, which
    is exact in double, so no boundary case can split the engines."""
    import duckdb

    from argodb_mapreduce_spark.functions.oracle_safe import gavg, gsum, sql_gavg, sql_gsum

    g = float(1 << 40)
    vals = []
    # Near-half-grid values: (k + 0.5) / 2^40 plus tiny perturbations.
    for k in (3, 7, 1001, 123457):
        base = (k + 0.5) / g
        for eps in (0.0, 1e-18, -1e-18, 5e-14, -5e-14):
            vals.append(base + eps)
    # Irrational-ish values from divisions and square roots.
    for n in range(1, 60):
        vals.append((n / 7.0) / math.sqrt(n + 1))
        vals.append(-(n / 13.0) / (n + 0.3))
    sdf = spark.createDataFrame([(v,) for v in vals], "v double")
    srow = sdf.agg(gsum("v").alias("s"), gavg("v").alias("a")).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    osum, oavg = con.execute(
        f"SELECT {sql_gsum('v')} AS s, {sql_gavg('v')} AS a FROM t"
    ).fetchone()
    assert srow["s"] == osum, (srow["s"], osum)
    assert srow["a"] == oavg, (srow["a"], oavg)


@given(data=st.binary(max_size=5000))
@settings(max_examples=200, deadline=None)
def test_lzw_roundtrip_arbitrary_bytes(data):
    """GIF LZW encode->decode is the identity on arbitrary byte strings
    (covers empty input, runs, the KwKwK case, and — at the size cap —
    code-width growth)."""
    from argodb_mapreduce_spark.operators.multimodal import _lzw_codec

    enc, dec = _lzw_codec()
    assert dec(enc(data)) == data


@given(
    host=st.from_regex(r"[A-Za-z0-9.-]{1,20}", fullmatch=True),
    path=st.from_regex(r"[A-Za-z0-9/_-]{0,30}", fullmatch=True),
    scheme=st.sampled_from(["http://", "https://", "HTTP://", ""]),
    www=st.sampled_from(["www.", "WWW.", ""]),
    query=st.sampled_from(["", "?utm_source=x", "?a=1&b=2"]),
    frag=st.sampled_from(["", "#top", "#s-1"]),
    slash=st.sampled_from(["", "/"]),
)
@settings(max_examples=150, deadline=None)
def test_url_canonicalization_idempotent_and_noise_free(
    spark, host, path, scheme, www, query, frag, slash
):
    """canonicalize_url is idempotent and strips every noise class —
    evaluated through the real Spark expression (the same codegen the
    query runs), not a Python reimplementation."""
    from pyspark.sql import functions as F

    from argodb_mapreduce_spark.operators.dedup import canonicalize_url

    raw = f"{scheme}{www}{host}/{path}{slash}{query}{frag}"
    df = spark.createDataFrame([(raw,)], "url string").select(
        canonicalize_url(F.col("url")).alias("c1")
    )
    df = df.select("c1", canonicalize_url(F.col("c1")).alias("c2"))
    row = df.first()
    assert row.c2 == row.c1  # idempotent
    c = row.c1
    assert not c.startswith(("http://", "https://", "www."))
    assert "?" not in c and "#" not in c and not c.endswith("/")
    assert c == c.lower()


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["u1", "u2"]),           # user_id
            st.integers(min_value=0, max_value=8),    # ts (collisions likely)
            st.sampled_from(["X", "Y", "Z"]),         # event_type
            st.integers(min_value=0, max_value=50),   # value
        ),
        min_size=1,
        max_size=14,
    )
)
@settings(max_examples=25, deadline=None)
def test_pit_state_propagation_matches_interval_bruteforce(spark, rows):
    """The ordered-state-propagation reformulation of the point-in-time
    join must equal the declarative interval join on arbitrary small
    event sets — INCLUDING timestamp collisions, where the tie rules
    (inclusive valid_from; empty intervals for superseded same-ts
    changes) live."""
    from argodb_mapreduce_spark.operators.sessions import _pit_state_propagation

    data = [
        (u, t, i, et, float(v)) for i, (u, t, et, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "user_id string, ts long, event_id long, event_type string, value double"
    )
    got = {
        r.state_at_event_time: (r.n_events, round(r.total_value, 4))
        for r in _pit_state_propagation(df).collect()
    }
    # Brute force: derive SCD2 versions per user, interval-join each fact.
    from collections import defaultdict

    per_user = defaultdict(list)
    for u, t, i, et, v in data:
        per_user[u].append((t, i, et, v))
    agg = defaultdict(lambda: [0, 0.0])
    for u, evs in per_user.items():
        evs.sort()
        versions = []  # (valid_from, event_id, state)
        prev = None
        for t, i, et, _v in evs:
            if prev is None or et != prev:
                versions.append((t, i, et))
            prev = et
        bounds = [vf for vf, _i, _s in versions[1:]] + [None]
        for t, _i, _et, v in evs:
            state = None
            for (vf, _vi, s), vt in zip(versions, bounds):
                if t >= vf and (vt is None or t < vt):
                    state = s  # later same-vf version overwrites: empty
            agg[state][0] += 1
            agg[state][1] += v
    want = {s: (n, round(tv, 4)) for s, (n, tv) in agg.items()}
    assert got == want, (got, want, data)


_PYDS_HOOKS = None


def _pyds_hooks():
    global _PYDS_HOOKS
    if _PYDS_HOOKS is None:
        from argodb_mapreduce_spark.sources.python_datasource import (
            make_versioned_datasource,
        )

        _PYDS_HOOKS = make_versioned_datasource()._test_hooks
    return _PYDS_HOOKS


@given(
    value=st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), min_size=1, max_size=40
    ).filter(lambda s: s != "__HIVE_DEFAULT_PARTITION__")
)
@settings(max_examples=200, deadline=None)
def test_partition_branch_encode_decode_roundtrip(value):
    """The pyds writer's Spark-escapePathName encoding and the reader's
    branch decode are exact inverses for arbitrary string partition
    values (NULL sentinel excluded by strategy)."""
    h = _pyds_hooks()
    comp = h["branch_component"]("k", value, "string")
    assert comp.startswith("k=")
    # path-hostile characters never survive into the dir name
    assert not any(c in comp[2:] for c in '/\\:*?"')
    decoded = h["decode_branch"](comp)
    assert decoded == {"k": value}


@given(v=st.integers(min_value=-(2**62), max_value=2**62))
@settings(max_examples=100, deadline=None)
def test_partition_branch_int_roundtrip(v):
    h = _pyds_hooks()
    comp = h["branch_component"]("k", v, "bigint")
    raw = h["decode_branch"](comp)["k"]
    assert h["decode_part_value"](raw, "bigint") == v


def test_partition_branch_null_sentinel():
    h = _pyds_hooks()
    comp = h["branch_component"]("k", None, "string")
    assert comp == "k=__HIVE_DEFAULT_PARTITION__"
    assert h["decode_branch"](comp) == {"k": None}


def test_arrow_type_full_covers_nested_shapes():
    import pyarrow as pa

    h = _pyds_hooks()
    t = h["arrow_type_full"]
    assert t("struct<amount:decimal(12,2),ccy:string>") == pa.struct(
        [("amount", pa.decimal128(12, 2)), ("ccy", pa.string())]
    )
    assert t("map<decimal(4,1),int>") == pa.map_(pa.decimal128(4, 1), pa.int32())
    assert t("array<array<bigint>>") == pa.list_(pa.list_(pa.int64()))


# ------------------------------------------------- manifest log concurrency


def _ml_entries(n):
    return [{"version": v, "segments": [f"data-{v}"]} for v in range(n)]


def _ml_table(tmp_path, n):
    """Append n commits through the real append_entry (crossing the
    checkpoint interval so prune has run at least once)."""
    from argodb_mapreduce_spark.sources import manifest_log as ml

    p = str(tmp_path)
    entries = []
    for e in _ml_entries(n):
        entries.append(e)
        ml.append_entry(p, entries)
    return p, entries


def test_manifest_log_reader_retries_through_raced_prune(tmp_path, monkeypatch):
    """The documented retry contract (manifest_log.py docstring): a
    reader whose directory LISTING predates a checkpoint's tail-prune
    opens a since-deleted per-commit file, gets FileNotFoundError, and
    must re-list into the new (always complete) state — never surface
    the race. Simulated deterministically: the first listing returns a
    stale snapshot taken before files were pruned."""
    import os as _os

    from argodb_mapreduce_spark.sources import manifest_log as ml

    # 3 checkpoints (16/32/48): the prune at 48 deleted checkpoint 16,
    # so a reader whose listing predates checkpoint 32 — newest visible
    # checkpoint = 16 — now opens a vanished file.
    n = 3 * ml.CHECKPOINT_INTERVAL + 1
    p, entries = _ml_table(tmp_path, n)
    log_dir = _os.path.join(p, ml.LOG_DIR)
    ck1 = ml.CHECKPOINT_INTERVAL
    assert ml._ck_name(ck1) not in _os.listdir(log_dir)  # really pruned
    stale = [ml._ck_name(ck1)] + [
        ml._entry_name(v) for v in range(ck1 + 1, 2 * ck1)
    ]
    real_listdir = _os.listdir
    calls = {"n": 0}

    def racy_listdir(d):
        calls["n"] += 1
        if calls["n"] == 1:
            return stale  # pre-prune snapshot; its files are gone
        return real_listdir(d)

    monkeypatch.setattr(ml.os, "listdir", racy_listdir)
    got = ml.read_entries(p)
    assert [e["version"] for e in got] == [e["version"] for e in entries]
    assert calls["n"] >= 2  # the retry actually re-listed


def test_manifest_log_reader_race_budget_exhausts_loud(tmp_path, monkeypatch):
    """If EVERY re-list keeps racing (pathological), the reader fails
    with the last FileNotFoundError after _READ_RETRIES attempts
    instead of spinning forever."""
    import os as _os

    import pytest as _pytest

    from argodb_mapreduce_spark.sources import manifest_log as ml

    n = 3 * ml.CHECKPOINT_INTERVAL + 1
    p, _entries = _ml_table(tmp_path, n)
    ck1 = ml.CHECKPOINT_INTERVAL
    stale = [ml._ck_name(ck1)] + [
        ml._entry_name(v) for v in range(ck1 + 1, 2 * ck1)
    ]
    calls = {"n": 0}

    def always_stale(d):
        calls["n"] += 1
        return list(stale)

    monkeypatch.setattr(ml.os, "listdir", always_stale)
    with _pytest.raises(FileNotFoundError):
        ml.read_entries(p)
    assert calls["n"] == ml._READ_RETRIES


def test_manifest_log_empty_logdir_is_terminal_not_retried(tmp_path, monkeypatch):
    """ADVICE r12: a genuinely EMPTY _log/ (no marker array either) is
    a terminal state — surfaced once as ValueError, without burning the
    retry budget re-listing a directory that cannot heal."""
    import json as _json
    import os as _os

    import pytest as _pytest

    from argodb_mapreduce_spark.sources import manifest_log as ml

    p = str(tmp_path)
    _os.makedirs(_os.path.join(p, ml.LOG_DIR))
    with open(_os.path.join(p, ml.MARKER), "w") as f:
        _json.dump({"format": "log", "head": 0}, f)
    real_listdir = _os.listdir
    calls = {"n": 0}

    def counting_listdir(d):
        calls["n"] += 1
        return real_listdir(d)

    monkeypatch.setattr(ml.os, "listdir", counting_listdir)
    with _pytest.raises(ValueError, match="empty manifest log"):
        ml.read_entries(p)
    assert calls["n"] == 1  # no pointless retries


def test_manifest_log_crashed_write_leaves_no_partial_state(tmp_path, monkeypatch):
    """Crash injection at the dump: the atomic-write contract says a
    writer killed mid-serialization leaves no visible per-commit file
    (only a .tmp, swept by the next prune) and readers keep serving the
    pre-crash history; the retried append then succeeds."""
    import json as _json
    import os as _os

    from argodb_mapreduce_spark.sources import manifest_log as ml

    p, entries = _ml_table(tmp_path, 3)
    boom = {"armed": True}
    real_dump = _json.dump

    def exploding_dump(obj, f, **kw):
        if boom["armed"]:
            boom["armed"] = False
            raise OSError("disk full (injected)")
        return real_dump(obj, f, **kw)

    monkeypatch.setattr(ml.json, "dump", exploding_dump)
    new = {"version": 3, "segments": ["data-3"]}
    try:
        ml.append_entry(p, [*entries, new])
    except OSError:
        pass
    log_dir = _os.path.join(p, ml.LOG_DIR)
    assert ml._entry_name(3) not in os.listdir(log_dir)
    assert not [n for n in os.listdir(log_dir) if n.endswith(".tmp")]
    assert [e["version"] for e in ml.read_entries(p)] == [0, 1, 2]
    ml.append_entry(p, [*entries, new])  # retry lands cleanly
    assert [e["version"] for e in ml.read_entries(p)] == [0, 1, 2, 3]
