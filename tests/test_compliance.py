"""RTBF purge + written-state audit (operators/compliance.py)."""

from __future__ import annotations

import hashlib
import shutil

from java9_gc_log_parser_spark.operators.compliance import (
    rtbf_deny_list,
    rtbf_purge_audit,
)


def _denied(key: str) -> bool:
    return hashlib.md5(f"{key}:rtbf:v1".encode()).hexdigest()[0] == "0"


def test_deny_list_matches_hash_predicate(spark):
    ids = [f"conv-{i}" for i in range(200)]
    df = spark.createDataFrame([(i,) for i in ids], ["conv_id"])
    got = {r["conv_id"] for r in rtbf_deny_list(df).collect()}
    assert got == {i for i in ids if _denied(i)}
    assert 0 < len(got) < len(ids)  # the 200-key fixture straddles the rule


def test_purge_audit_counts_and_written_state(spark, tmp_path):
    ids = [f"conv-{i}" for i in range(64)]
    denied = [i for i in ids if _denied(i)]
    assert denied, "fixture must contain at least one denied key"
    rows = [(cid, k) for cid in ids for k in range(3)]
    sink = spark.createDataFrame(rows, ["conv_id", "turn_idx"])
    deny = rtbf_deny_list(sink)
    base = str(tmp_path / "rtbf")
    shutil.rmtree(base, ignore_errors=True)

    audit = {
        r["sink"]: r
        for r in rtbf_purge_audit({"s": sink}, deny, base).collect()
    }
    a = audit["s"]
    assert a["n_before"] == len(rows)
    assert a["n_deleted"] == 3 * len(denied)
    assert a["n_after"] == a["n_before"] - a["n_deleted"]
    assert a["n_residual"] == 0

    # the audit's post leg reflects what is actually on disk
    back = spark.read.parquet(f"{base}/s")
    assert back.count() == a["n_after"]
    assert back.filter(back.conv_id.isin(denied)).count() == 0
