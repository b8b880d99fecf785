"""Checkpointed micro-batch runner: resumable, idempotent, metric-emitting.

The reference has NO fault tolerance — an exception kills the Akka stream
(``GcService.scala:35-38``). The north rule requires the opposite: process the
table in partition-range micro-batches, checkpoint a manifest with
per-partition lineage + per-batch metrics, and resume idempotently.

Design:
  * batch key = ``pmod(xxhash64(conv_id), n_batches)`` — conversations stay
    whole within a batch (assembly needs every line of a (conv_id, event_id)
    group), and hashing spreads hot convs' *neighbors* evenly even though a
    single hot conv is indivisible.
  * the batch key is written as a PARTITION COLUMN at source-preparation time
    (``prepare_source``): each micro-batch then reads ``batch_bucket=b/``
    only — scan bytes ∝ 1/n_batches — instead of filtering a full scan of
    the table per batch (n_batches full scans of 100 TB). The manifest
    records the pruned scan's file count + bytes as evidence. A raw
    unpartitioned path still works (predicate fallback) for ad-hoc runs.
  * each sink writes to ``{root}/{sink}/batch={id}/`` with overwrite — a
    re-run of a half-finished batch replaces its output exactly (idempotent).
  * the manifest (JSONL) line for a batch is appended only after every sink
    for that batch has committed; a crash between sink write and manifest
    append re-runs the batch, which overwrites in place.
  * lineage per batch records the source path + the exact filter predicate;
    metrics record rows in/out per sink and wall seconds.

On a real cluster the same loop runs over Iceberg snapshot ranges; the batch
predicate becomes a snapshot/partition range and the sinks become Iceberg
appends with overwrite-by-filter.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..storage import (
    ICEBERG,
    TableRef,
    _as_ref,
    current_snapshot_id,
    path_exists,
    read_table,
    table_scan_stats,
    write_table,
)
from .pipeline import build

SINKS = ("pause_events", "tool_calls", "dead_letter", "assembled", "conv_state")


@dataclass
class BatchResult:
    batch_id: int
    rows_in: int
    sink_rows: dict
    wall_s: float


def _manifest_path(root: str) -> str:
    return os.path.join(root, "manifest.jsonl")


def completed_batches(root: str) -> set[int]:
    path = _manifest_path(root)
    done: set[int] = set()
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("status") == "ok":
                    done.add(rec["batch_id"])
    return done


def prepare_source(
    spark: SparkSession,
    transcripts: DataFrame,
    dest: TableRef | str,
    n_batches: int,
) -> TableRef:
    """Write the transcripts bucketed by ``batch_bucket`` as the table's
    partition layout (partition dirs on parquet, partition spec on Iceberg).

    One full pass over the input; every subsequent micro-batch (and any
    re-run/resume) scans exactly one partition — partition-dir pruning on
    parquet, manifest-level partition pruning on Iceberg.
    """
    ref = _as_ref(dest)
    ref = TableRef(ref.location, format=ref.format,
                   partition_by=("batch_bucket",))
    bucketed = transcripts.withColumn(
        "batch_bucket",
        F.pmod(F.xxhash64("conv_id"), F.lit(n_batches)).cast("int"),
    ).repartition("batch_bucket")
    write_table(bucketed, ref)
    return ref


def run_batch(
    spark: SparkSession,
    source_path: TableRef | str,
    root: str,
    batch_id: int,
    n_batches: int,
    verify_commit: bool = False,
) -> BatchResult:
    """Process one micro-batch: read its bucket, write every sink, append the
    manifest line.

    ``verify_commit``: the sink row metric is an Observation on the write job
    — rows *fed to the writer*, not a post-commit read-back, so a silent
    commit truncation would go unnoticed by the metric alone (the pre-r2 code
    re-read every sink, which doubles as an integrity check but re-scans the
    entire output per sink per batch — at 100 TB, re-reading everything just
    written). Setting ``verify_commit=True`` restores the check cheaply: one
    count() read-back of the SMALLEST sink (conv_state, O(conversations)
    rows) per batch, recorded in the manifest as ``commit_check``. Resume
    correctness never depends on the metric either way: the manifest line is
    appended only after every sink's write action returned, and a crash
    before the append re-runs + overwrites the whole batch.
    """
    src = _as_ref(source_path)
    snapshot = None
    if src.format == ICEBERG:
        # prepared Iceberg source: hidden-partition pruning on batch_bucket;
        # scan evidence from the .files METADATA table (manifest-backed),
        # never a filesystem walk — the driver cannot see a cluster's files
        predicate = f"batch_bucket = {batch_id}"
        transcripts = (
            read_table(spark, src)
            .filter(F.col("batch_bucket") == batch_id)
            .drop("batch_bucket")
        )
        scan_files, scan_bytes = table_scan_stats(
            spark, src, where=f"partition.batch_bucket = {batch_id}"
        )
        snapshot = current_snapshot_id(spark, src)
    elif path_exists(
        spark, bucket_dir := os.path.join(src.location,
                                          f"batch_bucket={batch_id}")
    ):
        # prepared source: partition-pruned scan — only this bucket's files
        predicate = f"batch_bucket = {batch_id}"
        transcripts = (
            read_table(spark, src.location)
            .filter(F.col("batch_bucket") == batch_id)
            .drop("batch_bucket")
        )
        scan_files, scan_bytes = table_scan_stats(spark, TableRef(bucket_dir))
    else:
        # raw unpartitioned path: every batch re-scans the full source
        predicate = f"pmod(xxhash64(conv_id), {n_batches}) = {batch_id}"
        transcripts = read_table(spark, src.location).filter(F.expr(predicate))
        scan_files, scan_bytes = table_scan_stats(spark, src)
    t0 = time.perf_counter()
    dfs = build(transcripts, persist=True)
    rows_in = dfs["parsed"].count()
    sink_rows = {}
    for sink in SINKS:
        out = os.path.join(root, sink, f"batch={batch_id}")
        df: DataFrame = dfs[sink]
        # row metric collected DURING the write (Observation piggybacks on
        # the write job) — re-reading the committed files to count them is
        # one extra scan of the entire output per sink per batch, which at
        # 100 TB means re-reading everything you just wrote
        obs = Observation(f"sink_rows_{sink}_{batch_id}")
        write_table(df.observe(obs, F.count(F.lit(1)).alias("rows")), out)
        sink_rows[sink] = int(obs.get["rows"])
    commit_check = None
    if verify_commit:
        # cheap integrity spot-check: read back the smallest sink and compare
        # its committed row count against the Observation metric
        sink = "conv_state"
        committed = read_table(
            spark, os.path.join(root, sink, f"batch={batch_id}")
        ).count()
        commit_check = {
            "sink": sink,
            "observed": sink_rows[sink],
            "committed": committed,
            "ok": committed == sink_rows[sink],
        }
        if not commit_check["ok"]:
            raise RuntimeError(
                f"commit check failed for batch {batch_id}: {commit_check}"
            )
    dfs["parsed"].unpersist()
    wall = time.perf_counter() - t0
    rec = {
        "batch_id": batch_id,
        "status": "ok",
        "rows_in": rows_in,
        "sink_rows": sink_rows,
        "commit_check": commit_check,
        "wall_s": round(wall, 3),
        "lineage": {
            "source": src.location,
            "format": src.format,
            "predicate": predicate,
            "scan_files": scan_files,
            "scan_bytes": scan_bytes,
            # Iceberg: the snapshot this batch read — the next incremental
            # run reads TableRef(start_snapshot_id=<this>) to scan only
            # rows committed since (storage.current_snapshot_id docstring)
            "snapshot_id": snapshot,
        },
        "n_batches": n_batches,
    }
    os.makedirs(root, exist_ok=True)
    with open(_manifest_path(root), "a") as f:
        f.write(json.dumps(rec) + "\n")
    return BatchResult(batch_id, rows_in, sink_rows, wall)


def run(
    spark: SparkSession,
    source_path: TableRef | str,
    root: str,
    n_batches: int = 8,
    stop_after: int | None = None,
    verify_commit: bool = False,
) -> list[BatchResult]:
    """Run all pending micro-batches (resuming past completed ones).

    ``stop_after`` processes at most that many pending batches — the test
    hook for simulating a mid-run crash.
    """
    done = completed_batches(root)
    results = []
    for b in range(n_batches):
        if b in done:
            continue
        results.append(
            run_batch(spark, source_path, root, b, n_batches,
                      verify_commit=verify_commit)
        )
        if stop_after is not None and len(results) >= stop_after:
            break
    return results


def read_sink(spark: SparkSession, root: str, sink: str) -> DataFrame:
    return read_table(spark, os.path.join(root, sink))
