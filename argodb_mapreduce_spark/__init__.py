"""argodb_mapreduce_spark — a PySpark-native analytics engine.

A from-scratch engine with the query / data-processing capability
surface of TranswarpCN/argodb-mapreduce (a Hadoop MapReduce InputFormat
connector for ArgoDB columnar tables), re-expressed Spark-first:

* scan/source semantics (snapshot scan, partition pruning, Hive type
  bridge, default-partition sentinels) — ``catalog`` / ``sources``;
* the relational operator surface that MapReduce users hand-roll
  (project/filter/join/agg/window/set-ops) — ``operators.relational``;
* scalar function pack — ``functions``;
* LLM-data-pipeline extensions (dedup, similarity search, multimodal
  columns, text analysis) — ``operators.dedup`` / ``operators.similarity``
  / ``operators.multimodal`` / ``functions.text``;
* streaming windows over the events table — ``streaming``.

Everything is DataFrame-first: operators declare logical plans and let
Catalyst/Tungsten pick physical strategies. No RDD code, no driver-side
materialization in any operator.
"""

from argodb_mapreduce_spark.session import get_spark
from argodb_mapreduce_spark.catalog import TABLES, Engine, load_table, scan

__all__ = ["get_spark", "TABLES", "Engine", "load_table", "scan"]
