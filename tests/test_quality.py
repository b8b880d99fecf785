"""Unit tests for operators/quality.py (data-contract audit)."""

from __future__ import annotations

from java9_gc_log_parser_spark.operators.quality import (
    fk_orphan_check,
    predicate_check,
    unique_check,
)
from pyspark.sql import functions as F


def test_fk_orphan_counts_only_nonnull_misses(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (99,), (None,)], "k long"
    )
    parent = spark.createDataFrame([(1,), (2,), (2,)], "p long")
    row = fk_orphan_check(child, parent, "k", "p", "c1", "child").collect()[0]
    # 99 is an orphan; NULL child key is a nullability problem, not an
    # FK orphan (checked separately)
    assert row["n_rows"] == 4 and row["n_violations"] == 1
    # duplicate parent keys must not inflate the child count
    assert row["check_type"] == "fk"


def test_predicate_check_null_predicate_is_violation(spark):
    t = spark.createDataFrame([(5,), (None,), (-1,)], "v int")
    row = predicate_check(t, F.col("v") > 0, "c2", "range", "t").collect()[0]
    # -1 fails, NULL predicate is unknown -> counted as violation
    assert row["n_rows"] == 3 and row["n_violations"] == 2


def test_unique_check_counts_duplicates(spark):
    t = spark.createDataFrame([(1,), (1,), (1,), (2,)], "k int")
    row = unique_check(t, "k", "c3", "t").collect()[0]
    assert row["n_rows"] == 4 and row["n_violations"] == 2
