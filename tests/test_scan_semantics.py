"""Reference scan error/edge semantics (SURVEY.md §5 test-design rules)."""

from __future__ import annotations

import pytest

from argodb_mapreduce_spark.catalog import ScanError, parse_filter, scan, table_path
from argodb_mapreduce_spark.operators.scans import partitioned_lineitem


def test_filter_on_non_partitioned_table_errors(spark, sf_dir):
    # ArgodbMapreduceInputFormat.java:230-232
    with pytest.raises(ScanError, match="not a partition table"):
        scan(spark, table_path(sf_dir, "lineitem"), filter="l_returnflag=R")


def test_filter_unknown_column_errors(spark, sf_dir):
    # MetaUtils.java:48-51
    path = partitioned_lineitem(spark, sf_dir)
    with pytest.raises(ScanError, match="filter column"):
        scan(spark, path, filter="no_such_col=1")


def test_filter_non_partition_column_errors(spark, sf_dir):
    # ArgodbMapreduceInputFormat.java:233-238 — only partition-key equality.
    path = partitioned_lineitem(spark, sf_dir)
    with pytest.raises(ScanError, match="not a partition column"):
        scan(spark, path, filter="l_orderkey=1")


def test_filter_no_match_is_empty_not_error(spark, sf_dir):
    # ArgodbMapreduceInputFormat.java:123-125,246-248
    path = partitioned_lineitem(spark, sf_dir)
    assert scan(spark, path, filter="l_returnflag=ZZZ").count() == 0


def test_quoted_filter_value_equivalent(spark, sf_dir):
    # ArgodbSerdeUtils.java:18-26 — col="v" ≡ col=v
    assert parse_filter('c="R"') == ("c", "R")
    assert parse_filter("c=R") == ("c", "R")
    path = partitioned_lineitem(spark, sf_dir)
    n_quoted = scan(spark, path, filter='l_returnflag="R"').count()
    n_bare = scan(spark, path, filter="l_returnflag=R").count()
    assert n_quoted == n_bare > 0


def test_bad_filter_syntax_errors(spark, sf_dir):
    with pytest.raises(ScanError, match="unsupported filter"):
        parse_filter("l_returnflag>R")


def test_projection_unknown_column_errors(spark, sf_dir):
    with pytest.raises(ScanError, match="column"):
        scan(spark, table_path(sf_dir, "lineitem"), columns=["nope"])


def test_partition_values_appended_as_trailing_columns(spark, sf_dir):
    # ArgodbMapreduceRecordReader.java:182-198 — partition values are
    # reconstructed from directory names at the row tail.
    path = partitioned_lineitem(spark, sf_dir)
    df = scan(spark, path)
    assert df.columns[-1] == "l_returnflag"
