"""Unit tests for operators/quality.py (data-contract audit)."""

from __future__ import annotations

import pytest

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


# ---------------------------------------------------------- Benford audit


def test_benford_digit_counts_and_spine(spark):
    from java9_gc_log_parser_spark.operators.quality import benford_audit

    # centi values: 1.23->123 (d=1), 19.0->1900 (d=1), 0.25->25 (d=2),
    # 0.005->0 (dropped), 9.5->950 (d=9)
    df = spark.createDataFrame(
        [(1, 1.23), (2, 19.0), (3, 0.25), (4, 0.005), (5, 9.5)],
        "event_id long, value double",
    )
    rows = {r["digit"]: r for r in benford_audit(df).collect()}
    assert set(rows) == set(range(1, 10))  # all 9 digits present
    assert rows[1]["n"] == 2
    assert rows[2]["n"] == 1
    assert rows[9]["n"] == 1
    assert rows[3]["n"] == 0
    assert rows[1]["n_dropped"] == 1
    assert rows[1]["share"] == pytest.approx(0.5)
    assert rows[1]["benford_share"] == pytest.approx(0.30103, abs=1e-5)


def test_benford_uniformity_gap_detects_flat_fill(spark):
    from java9_gc_log_parser_spark.operators.quality import benford_audit

    # synthetic flat fill: every value starts with digit 5
    df = spark.createDataFrame(
        [(i, 5.0 + i * 0.001) for i in range(100)],
        "event_id long, value double",
    )
    rows = {r["digit"]: r for r in benford_audit(df).collect()}
    assert rows[5]["share"] == pytest.approx(1.0)
    assert rows[5]["abs_gap"] > 0.9  # flagrant Benford violation
