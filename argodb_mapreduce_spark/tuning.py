"""Scoped planner-configuration helper for bounded iterative phases.

Several operators chain a fixed number of tiny-data rounds (power
iterations over a checkpointed ≤dims² covariance, PageRank over a
≤|nations|² edge list, label propagation over a materialized edge set).
With AQE enabled, every Exchange in such a phase materializes as its
own query-stage job, and in local mode each job carries ~50-300 ms of
fixed scheduling cost — for a 25-row loop state that fixed cost IS the
query (measured in operators/dedup.min_label_components: ~8 jobs/round
with AQE vs 2 without, on ~100 edges). AQE's benefits (runtime
coalescing, skew splits) need statistics worth adapting to; a bounded,
already-materialized loop state has none.

``scoped_conf`` applies runtime-mutable settings for the duration of a
``with`` block and restores the previous values on exit (unset keys are
re-unset), so the surrounding query keeps the session's planning
behavior — the same save/restore contract min_label_components and
streaming's _run_to_memory already use inline.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def scoped_conf(spark: SparkSession, settings: dict[str, str]):
    prev: dict[str, str | None] = {}
    for k, v in settings.items():
        try:
            prev[k] = spark.conf.get(k, None)
            spark.conf.set(k, str(v))
        except Exception:  # noqa: BLE001 - immutable conf: keep as-is
            prev.pop(k, None)
    try:
        yield
    finally:
        for k, p in prev.items():
            try:
                if p is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, p)
            except Exception:  # noqa: BLE001
                pass


def bounded_loop_conf(width: int = 1) -> dict[str, str]:
    """Planner settings for a fixed-shape loop over BOUNDED state.

    ``width`` must derive from the loop state's provable size bound
    (e.g. 1 for a ≤625-row edge list), never from the machine — the
    caller documents the bound. AQE is disabled for the scope because a
    bounded materialized state gives it nothing to adapt; the session
    value is restored by :func:`scoped_conf` on exit.
    """
    return {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": str(max(1, int(width))),
    }
