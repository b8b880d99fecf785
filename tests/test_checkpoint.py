"""Resumability tests: crash mid-run, resume, identical sinks (SURVEY §7.7)."""

from __future__ import annotations

import json
import os

import pytest

from java9_gc_log_parser_spark.plans import checkpoint as cp
from java9_gc_log_parser_spark.plans.pipeline import build
from java9_gc_log_parser_spark.sources.transcripts import synth_transcripts


@pytest.fixture(scope="module")
def source_path(spark, sf_dir, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ckpt") / "transcripts.parquet")
    synth_transcripts(spark, sf_dir).write.mode("overwrite").parquet(p)
    return p


def _collect_sorted(df, cols):
    return sorted([tuple(r) for r in df.select(*cols).collect()], key=repr)


def test_crash_resume_identical(spark, source_path, tmp_path):
    root = str(tmp_path / "out")
    n_batches = 4

    # run 2 of 4 batches, then "crash"
    r1 = cp.run(spark, source_path, root, n_batches, stop_after=2)
    assert len(r1) == 2
    assert cp.completed_batches(root) == {0, 1}

    # resume: only the remaining batches run
    r2 = cp.run(spark, source_path, root, n_batches)
    assert sorted(b.batch_id for b in r2) == [2, 3]

    # resumed output == single-shot pipeline output, sink by sink
    single = build(spark.read.parquet(source_path))
    for sink, cols in [
        ("assembled", ["conv_id", "event_id", "pause_type", "duration_ms"]),
        ("pause_events", ["conv_id", "turn_idx", "event_class"]),
        ("dead_letter", ["conv_id", "text", "reason_code"]),
        ("conv_state", ["conv_id", "young_gcs", "remarks", "heap_size"]),
    ]:
        got = _collect_sorted(cp.read_sink(spark, root, sink), cols)
        want = _collect_sorted(single[sink], cols)
        assert got == want, f"{sink}: resumed output differs from single-shot"
    single["parsed"].unpersist()


def test_rerun_is_idempotent(spark, source_path, tmp_path):
    root = str(tmp_path / "out2")
    cp.run(spark, source_path, root, 2)
    n_before = cp.read_sink(spark, root, "assembled").count()
    # simulate a crash after sink write but before manifest append: re-run
    # batch 0 directly — overwrite makes it idempotent
    cp.run_batch(spark, source_path, root, 0, 2)
    assert cp.read_sink(spark, root, "assembled").count() == n_before


def test_manifest_lineage_and_metrics(spark, source_path, tmp_path):
    root = str(tmp_path / "out3")
    cp.run(spark, source_path, root, 2)
    with open(os.path.join(root, "manifest.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert len(recs) == 2
    for rec in recs:
        assert rec["status"] == "ok"
        assert rec["rows_in"] > 0
        assert "pause_events" in rec["sink_rows"]
        assert rec["wall_s"] > 0
        assert "xxhash64(conv_id)" in rec["lineage"]["predicate"]
        assert rec["lineage"]["source"] == source_path
    # batches partition the input exactly
    total_in = sum(r["rows_in"] for r in recs)
    assert total_in == spark.read.parquet(source_path).count()
