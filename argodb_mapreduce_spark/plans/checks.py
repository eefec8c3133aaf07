"""Physical-plan inspection helpers (the 100 TB feedback loop).

The scale story lives in the physical plan: filters must reach the
parquet scan (PushedFilters), projections must prune the ReadSchema,
partition filters must prune directories, small dims must broadcast,
and co-partitioned layouts must elide exchanges. These helpers make
those properties assertable in tests instead of eyeballed.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> str:
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", explain_str(df))
    return ";".join(m)


def read_schema(df: DataFrame) -> str:
    m = re.findall(r"ReadSchema: ([^\n]*)", explain_str(df))
    return ";".join(m)


def partition_filters(df: DataFrame) -> str:
    m = re.findall(r"PartitionFilters: \[([^\]]*)\]", explain_str(df))
    return ";".join(m)


def n_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges only — broadcasts are cheap by design and
    counted separately (\\bExchange\\b does not match BroadcastExchange)."""
    return len(re.findall(r"\bExchange\b", explain_str(df, "simple")))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def wholestage_codegen_ids(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans — wider/fewer is better."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_str(df, "simple"))))


def scan_metrics(df: DataFrame) -> list[dict]:
    """Executed-plan file-scan metrics (numFiles, filesSize,
    numPartitions, numOutputRows, ...), one dict per scan leaf.

    Call AFTER an action executed the SAME DataFrame — metrics live on
    the executed plan instance; a fresh action like ``df.count()``
    builds a different plan and leaves these at zero.
    This is the observable proof that partition pruning / data skipping
    actually reduced the planned file set, not just the plan text."""

    def _leaves(node, acc):
        # AdaptiveSparkPlanExec is a leaf node wrapping the real plan:
        # without unwrapping, any AQE-finalized query (anything with an
        # exchange) would silently report no scans at all.
        if "AdaptiveSparkPlan" in node.getClass().getSimpleName():
            return _leaves(node.executedPlan(), acc)
        n = node.children().size()
        if n == 0:
            acc.append(node)
        else:
            for i in range(n):
                _leaves(node.children().apply(i), acc)
        return acc

    out = []
    for leaf in _leaves(df._jdf.queryExecution().executedPlan(), []):
        if "Scan" in leaf.getClass().getSimpleName():
            m = leaf.metrics()
            it = m.keys().iterator()
            vals = {}
            while it.hasNext():
                k = it.next()
                vals[k] = m.apply(k).value()
            out.append(vals)
    return out
