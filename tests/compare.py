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


def assert_matches(spark_df, oracle: str, sf_dir: str, name: str = "") -> None:
    spk = spark_df.toPandas()
    con = duck_connection(sf_dir)
    try:
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
