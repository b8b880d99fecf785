"""PassJoin edit-distance join: completeness vs brute force, soundness,
segment-cap behavior, and plan shape (no cartesian, no Python UDF)."""

from __future__ import annotations

import itertools

import pytest

from java9_gc_log_parser_spark.operators.linkage import (
    edit_distance_join,
    normalized_title,
)


def _lev(a: str, b: str) -> int:
    # textbook DP — independent of both engines
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


def _brute(strings):
    out = set()
    for (i, a), (j, b) in itertools.combinations(enumerate(strings), 2):
        if _lev(a, b) <= 1:
            out.add((i, j))
    return out


# mutations hit every structural case: sub/ins/del at segment boundaries,
# start, end, and middle of each half
BASE = "the quick brown fox"
MUTS = [
    BASE,                      # 0: exact dup of 1
    BASE,                      # 1
    "Xhe quick brown fox",     # 2: sub at pos 1 (seg1 head)
    "the quickXbrown fox",     # 3: sub at seg boundary
    "the quick brown foX",     # 4: sub at end (seg2 tail)
    "he quick brown fox",      # 5: del at start
    "the quick brown fo",      # 6: del at end
    "the quic brown fox",      # 7: del mid-seg1
    "tthe quick brown fox",    # 8: ins at start
    "the quick brown foxx",    # 9: ins at end
    "the quick bbrown fox",    # 10: ins mid-seg2
    "a completely other row",  # 11: far away
    "zz",                      # 12: minimal length
    "zx",                      # 13: ed1 from 12
]


def test_passjoin_complete_and_sound_vs_brute_force(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(MUTS)], "doc_id long, title string"
    )
    got = {
        (r["a_id"], r["b_id"])
        for r in edit_distance_join(df).collect()
    }
    assert got == _brute(MUTS)


def test_passjoin_reports_exact_distance_and_lengths(spark):
    df = spark.createDataFrame(
        [(1, "abcd"), (2, "abcd"), (3, "abed"), (4, "abcde")],
        "doc_id long, title string",
    )
    rows = {(r["a_id"], r["b_id"]): r
            for r in edit_distance_join(df).collect()}
    assert rows[(1, 2)]["ed"] == 0
    assert rows[(1, 3)]["ed"] == 1
    assert rows[(1, 4)]["ed"] == 1
    assert rows[(1, 4)]["len_b"] == 5


def test_passjoin_seg_cap_drops_hot_segment_pairs(spark):
    # 30 records sharing one boilerplate title: C(30,2) pairs exact;
    # capping segment frequency at 5 kills the hot bucket entirely
    rows = [(i, "shared boilerplate title") for i in range(30)]
    rows += [(100, "unique string one"), (101, "unique string onX")]
    df = spark.createDataFrame(rows, "doc_id long, title string")
    full = edit_distance_join(df).count()
    capped = edit_distance_join(df, max_seg_freq=5)
    assert full == 30 * 29 // 2 + 1
    assert capped.count() == 1  # only the unique near-pair survives


def test_passjoin_plan_no_cartesian_no_python(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(MUTS)], "doc_id long, title string"
    )
    out = edit_distance_join(df)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_normalized_title_shape(spark):
    df = spark.createDataFrame(
        [(1, "The QUICK, brown; fox!! 0123456789 tail beyond prefix")],
        "doc_id long, text string",
    )
    # first 24 chars are "The QUICK, brown; fox!! " -> strip punctuation,
    # lowercase, trim
    [r] = df.select(normalized_title().alias("t")).collect()
    assert r["t"] == "the quick brown fox"
