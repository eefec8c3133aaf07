"""Local stand-in for the driver's Spark-vs-DuckDB oracle comparison.

Mirrors the driver contract: run the Spark query and the DuckDB oracle
on the same parquet tables, then compare row count, column names, and
an order-insensitive canonical form of every value. Exact comparison —
the engine's oracle-safe arithmetic conventions are designed to make
values bit-identical, so any mismatch here is a real query bug.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
from typing import Any

import duckdb
import numpy as np
import pandas as pd

from argodb_mapreduce_spark.catalog import TABLES, table_path


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')")
    return con


def _canon_value(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (np.floating, float)):
        f = float(v) + 0.0  # normalize -0.0
        return None if math.isnan(f) else f
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return int(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, dt.date):
        return dt.datetime(v.year, v.month, v.day)
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon_value(x) for x in v)
    if v is pd.NaT:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_value(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    rows.sort(key=repr)
    return rows


def _assert_driver_safe_types(spark_df, con, oracle: str, name: str) -> None:
    """The driver's value hash is stricter than pandas-level comparison:
    DuckDB HUGEINT and DATE-vs-TIMESTAMP skew land as object-dtype /
    repr differences (r1: q12, events_retention, fn_date), and top-level
    list columns are unhashable (r1: scan_embeddings). Integer *widths*
    are proven safe (window_rank int-vs-BIGINT was driver-green r1);
    these three classes are not — catch them in pytest, not round N+1."""
    sdt = dict(spark_df.dtypes)
    ddt = {r[0]: r[1] for r in con.execute(f"DESCRIBE ({oracle})").fetchall()}
    for col, st in sdt.items():
        dt = ddt.get(col)
        if dt is None:
            continue
        assert dt != "HUGEINT", (
            f"{name}.{col}: oracle returns HUGEINT — CAST(... AS BIGINT) in the oracle SQL"
        )
        s_date, d_date = st == "date", dt == "DATE"
        s_ts = st.startswith("timestamp")
        d_ts = dt.startswith("TIMESTAMP")
        assert not (s_date and d_ts) and not (s_ts and d_date), (
            f"{name}.{col}: date/timestamp skew (spark={st}, duckdb={dt}) — align both sides"
        )
        assert not st.startswith("array") and not dt.endswith("[]"), (
            f"{name}.{col}: top-level array column is unhashable for the driver — "
            f"emit to_json/array_join instead (spark={st}, duckdb={dt})"
        )


def assert_matches(spark_df, oracle: str, sf_dir: str, name: str = "") -> None:
    spk = spark_df.toPandas()
    con = duck_connection(sf_dir)
    try:
        _assert_driver_safe_types(spark_df, con, oracle, name)
        duck = con.execute(oracle).df()
    finally:
        con.close()
    assert sorted(spk.columns) == sorted(duck.columns), (
        f"{name}: column mismatch spark={sorted(spk.columns)} duck={sorted(duck.columns)}"
    )
    assert len(spk) == len(duck), f"{name}: row count spark={len(spk)} duck={len(duck)}"
    s_rows, d_rows = canon_rows(spk), canon_rows(duck)
    mismatches = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[0]}"
