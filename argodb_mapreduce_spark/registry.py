"""Query registry: the single source of truth for ``__spark_entry__``.

Every implemented operator from SURVEY.md §2 registers here with a
(spark, sf_dir) -> DataFrame callable and, where ANSI-SQL-expressible,
a DuckDB oracle SQL twin. The driver's correctness harness runs both
sides at sf=0.01 and hash-compares; tests/test_oracle_parity.py runs
the same comparison locally at sf=0.001.

Conventions (see functions/oracle_safe.py for why):
* every computed column is aliased identically on both sides;
* double aggregates go through exact-decimal summation;
* LIMIT/top-k queries carry a total order (unique-key tie-break);
* queries never collect to the driver.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: Modules that contribute registered queries (imported lazily so that
#: a bug in one module cannot take down the whole registry import).
_QUERY_MODULES = (
    "argodb_mapreduce_spark.operators.scans",
    "argodb_mapreduce_spark.operators.relational",
    "argodb_mapreduce_spark.operators.joins_advanced",
    "argodb_mapreduce_spark.operators.merge",
    "argodb_mapreduce_spark.functions.scalar",
    "argodb_mapreduce_spark.functions.stats",
    "argodb_mapreduce_spark.functions.udfs",
    "argodb_mapreduce_spark.operators.dedup",
    "argodb_mapreduce_spark.operators.similarity",
    "argodb_mapreduce_spark.operators.multimodal",
    "argodb_mapreduce_spark.functions.text",
    "argodb_mapreduce_spark.streaming.windows",
    "argodb_mapreduce_spark.sources.hive_partitions",
)


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, Query] = {}
_loaded = False


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator: add a (spark, sf_dir) -> DataFrame query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    _loaded = True


def all_queries() -> dict[str, Query]:
    _load()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
