"""Every registered query vs its DuckDB oracle at sf=0.001 — the local
mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from argodb_mapreduce_spark import registry
from tests.compare import assert_matches

ALL = registry.all_queries()


@pytest.mark.parametrize("name", sorted(ALL))
def test_query(name, spark, sf_dir):
    q = ALL[name]
    df = q.fn(spark, sf_dir)
    if q.oracle is None:
        # Rows-only check (driver's weaker path for non-SQL-expressible ops).
        n = df.count()
        assert n >= 0
        # Self-validating queries expose boolean check columns — all must hold.
        checks = [c for c, t in df.dtypes if t == "boolean" and (c.startswith("within_") or c.endswith("_ok"))]
        for c in checks:
            bad = df.filter(f"NOT {c}").count()
            assert bad == 0, f"{name}: self-check column {c} failed on {bad} rows"
    else:
        assert_matches(df, q.oracle, sf_dir, name=name)
