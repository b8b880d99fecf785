"""Unit tests for operators/asof.py: semantics vs a brute-force Python
reference, tie handling, boundary exactness, and null (no-match) rows."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from java9_gc_log_parser_spark.operators.asof import asof_join, range_join

T0 = dt.datetime(2024, 1, 1)


def _ts(sec):
    return T0 + dt.timedelta(seconds=sec)


def test_asof_join_matches_bruteforce_with_ties_and_nulls(spark):
    left = spark.createDataFrame(
        [(i, 1 + i % 2, _ts(i * 10)) for i in range(20)],
        "id long, k long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (100, 1, _ts(0), 1.0),    # before everything on k=1
            (101, 1, _ts(95), 2.0),   # mid-stream
            (102, 1, _ts(180), 3.0),  # EXACTLY at left id=18's ts -> inclusive
            (103, 2, _ts(55), 4.0),   # k=2 has no match before t=55
        ],
        "rid long, k long, ts timestamp_ntz, v double",
    )
    out = {
        r["id"]: (r["asof_rid"], r["asof_v"])
        for r in asof_join(left, right, "k", "ts", ("rid", "v")).collect()
    }
    assert len(out) == 20
    rights = [(100, 1, 0, 1.0), (101, 1, 95, 2.0), (102, 1, 180, 3.0),
              (103, 2, 55, 4.0)]
    for i in range(20):
        k, t = 1 + i % 2, i * 10
        cand = [(rid, v) for rid, rk, rt, v in rights if rk == k and rt <= t]
        expect = max(cand, key=lambda c: c[0]) if cand else (None, None)
        # max rid == latest ts in this fixture
        assert out[i] == expect, (i, out[i], expect)
    # k=2 rows before t=55 really are null (left-outer, no fabricated match)
    assert out[1] == (None, None) and out[3] == (None, None)


def test_asof_join_has_no_join_node(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(5))], "id long, k long, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [(9, 1, _ts(1), 0.5)], "rid long, k long, ts timestamp_ntz, v double"
    )
    plan = (
        asof_join(left, right, "k", "ts", ("rid", "v"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # union-and-carry: a window, never any join operator
    assert "Join" not in plan
    assert "Window" in plan


def test_range_join_boundaries_and_bucket_crossings(spark):
    # window = 100s; pairs that cross the bucket boundary (t=95 -> 105)
    # MUST be found, rt == lt included, rt == lt + W excluded
    rows = [(1, 1, _ts(95)), (2, 1, _ts(105)), (3, 1, _ts(195)),
            (4, 1, _ts(200)), (5, 2, _ts(100))]
    ev = spark.createDataFrame(rows, "id long, k long, ts timestamp_ntz")
    out = sorted(
        (r["l_id"], r["r_id"], r["delta_us"])
        for r in range_join(
            ev, ev, "k", "ts", 100_000_000, ("id",), ("id",)
        ).collect()
    )
    # brute force in Python
    expect = sorted(
        (li, ri, (rt - lt).seconds * 1_000_000)
        for li, lk, lt in [(r[0], r[1], r[2]) for r in rows]
        for ri, rk, rt in [(r[0], r[1], r[2]) for r in rows]
        if lk == rk and rt >= lt
        and (rt - lt).total_seconds() * 1_000_000 < 100_000_000
    )
    assert out == expect
    # the cross-bucket pair (1 -> 2) is present; the exact-window pair
    # (1 -> 3, delta == W == 100s) is correctly excluded (half-open);
    # self-pairs (delta 0) are included
    assert (1, 2, 10_000_000) in out
    assert all(not (l == 1 and r == 3) for l, r, _ in out)
    assert (1, 1, 0) in out


def test_range_join_plan_is_equijoin_only(spark):
    ev = spark.createDataFrame(
        [(1, 1, _ts(0))], "id long, k long, ts timestamp_ntz"
    )
    plan = (
        range_join(ev, ev, "k", "ts", 100_000_000, ("id",), ("id",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
