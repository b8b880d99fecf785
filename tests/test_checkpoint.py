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


def test_prepared_source_prunes_scans(spark, sf_dir, tmp_path):
    """With a bucket-partitioned source each micro-batch scans ~1/n of the
    data (manifest records the pruned file set), and results still equal the
    single-shot pipeline."""
    src = str(tmp_path / "psrc")
    root = str(tmp_path / "pout")
    n_batches = 4
    cp.prepare_source(spark, synth_transcripts(spark, sf_dir), src, n_batches)

    cp.run(spark, src, root, n_batches)
    with open(os.path.join(root, "manifest.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert len(recs) == n_batches
    total_bytes = sum(r["lineage"]["scan_bytes"] for r in recs)
    for rec in recs:
        assert rec["lineage"]["predicate"] == f"batch_bucket = {rec['batch_id']}"
        # pruned scan: each batch reads well under half the total source
        assert rec["lineage"]["scan_bytes"] < total_bytes / 2
        assert rec["lineage"]["scan_files"] >= 1

    # batches still partition the input exactly, and outputs match single-shot
    total_in = sum(r["rows_in"] for r in recs)
    plain = synth_transcripts(spark, sf_dir)
    assert total_in == plain.count()
    single = build(plain)
    got = _collect_sorted(
        cp.read_sink(spark, root, "assembled"),
        ["conv_id", "event_id", "pause_type", "duration_ms"],
    )
    want = _collect_sorted(
        single["assembled"], ["conv_id", "event_id", "pause_type", "duration_ms"]
    )
    assert got == want
    single["parsed"].unpersist()
