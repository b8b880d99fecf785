"""Per-micro-batch cumulative GcState snapshots + metrics (SURVEY §2.1 K2).

The reference pushes one cumulative ``GcState`` JSON per event over a
Server-Sent-Events socket with a heartbeat (``HttpFrontEnd.scala:24-37``).
The capability — *push incremental aggregate snapshots as data arrives* —
maps to Structured Streaming ``foreachBatch``: each micro-batch of assembled
pause events folds into a running per-conversation state table, every batch
appends its snapshot (the SSE "event") and a metrics record (the
"heartbeat": batch id, rows, convs, wall seconds) to a JSONL feed.

The running state is a *mergeable partial aggregate*: alongside the GcState
counters it carries the two argmax keys (``_max_off`` for heap,
``_max_nr_off`` for generation sizes — Remark updates heap but not
generations, ``GcStateFlow.scala:28-29``), so state(prev) ⊕ state(batch) is
itself a groupBy — the same shape Spark uses for partial/final aggregation,
applied across micro-batches. After any prefix of batches the exposed state
equals ``operators.aggregate.conv_state_final`` over the same events
(asserted in tests).

Batch sizing note: micro-batches are bounded (maxFilesPerTrigger), so the
per-batch groupBy needs no salting; the *merge* groupBy touches one row per
conv per side.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregate import COUNTERS, GEN_COLS
from .assembler import stream_assembled

#: exposed snapshot schema == conv_state_final's schema
STATE_COLS = (
    ["conv_id"]
    + list(COUNTERS)
    + ["time_offset_ms", "heap_size", "heap_total"]
    + GEN_COLS
)
_MERGE_COLS = STATE_COLS + ["_max_nr_off"]


def batch_state(assembled_ok: DataFrame) -> DataFrame:
    """Mergeable per-conv partial state from one batch of ok pause events."""
    pt = F.col("pause_type")
    nr_key = F.when(pt != "Remark", F.col("offset_ms"))
    return assembled_ok.groupBy("conv_id").agg(
        *[
            F.sum((pt == t).cast("long")).alias(name)
            for name, t in COUNTERS.items()
        ],
        F.max("offset_ms").alias("time_offset_ms"),
        F.max_by("heap_after", "offset_ms").alias("heap_size"),
        F.max_by("heap_total", "offset_ms").alias("heap_total"),
        *[F.max_by(F.col(c), nr_key).alias(c) for c in GEN_COLS],
        F.max(nr_key).alias("_max_nr_off"),
    )


def merge_states(prev: DataFrame, batch: DataFrame) -> DataFrame:
    """state ⊕ state: counters add; heap follows max time_offset_ms;
    generation sizes follow max _max_nr_off (null-keyed rows never win)."""
    both = prev.select(*_MERGE_COLS).unionByName(batch.select(*_MERGE_COLS))
    return both.groupBy("conv_id").agg(
        *[F.sum(name).alias(name) for name in COUNTERS],
        F.max("time_offset_ms").alias("time_offset_ms"),
        F.max_by("heap_size", "time_offset_ms").alias("heap_size"),
        F.max_by("heap_total", "time_offset_ms").alias("heap_total"),
        *[F.max_by(F.col(c), F.col("_max_nr_off")).alias(c) for c in GEN_COLS],
        F.max("_max_nr_off").alias("_max_nr_off"),
    )


def _current_batch_id(out_root: str) -> int | None:
    """Last durably-applied batch id, from the atomic pointer file."""
    ptr = os.path.join(out_root, "_CURRENT")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return int(f.read().strip())


def _gen_dir(out_root: str, batch_id: int) -> str:
    return os.path.join(out_root, "state_gens", f"batch={batch_id}")


def current_state(spark: SparkSession, out_root: str) -> DataFrame | None:
    """The cumulative state as of the last applied batch (None before any)."""
    bid = _current_batch_id(out_root)
    if bid is None:
        return None
    return spark.read.parquet(_gen_dir(out_root, bid))


def final_state(spark: SparkSession, out_root: str) -> DataFrame:
    """The exposed cumulative state (merge internals dropped, nulls zeroed
    like ``GcState``'s zero-initialised generation sizes)."""
    df = current_state(spark, out_root)
    if df is None:
        raise FileNotFoundError(f"no applied state under {out_root}")
    return df.select(
        "conv_id",
        *COUNTERS,
        "time_offset_ms",
        "heap_size",
        "heap_total",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in GEN_COLS],
    )


def stream_conv_state(
    spark: SparkSession,
    source_path: str,
    input_schema,
    out_root: str,
    max_files_per_trigger: int = 8,
    available_now: bool = True,
):
    """Start the snapshot stream; returns the StreamingQuery.

    Layout under ``out_root``:
      state_gens/batch=N/    cumulative state generation after batch N
      _CURRENT               atomic pointer: last durably-applied batch id
      snapshots/batch=N/     the state as of batch N (the SSE "event" feed)
      metrics.jsonl          one heartbeat line per micro-batch (batch-id
                             deduped; replays append nothing)
    """
    assembled = stream_assembled(
        spark, source_path, input_schema,
        max_files_per_trigger=max_files_per_trigger,
    ).filter(F.col("verdict") == "ok")

    os.makedirs(out_root, exist_ok=True)

    def _emit(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch is at-least-once: after failure recovery Spark replays
        # the in-flight batch_id. Idempotence: each state generation is keyed
        # by batch_id and exposed via an atomically-replaced pointer file, so
        # a replayed batch_id <= last-applied is skipped (its effects are
        # already durable), and a crash mid-write leaves the pointer at the
        # previous complete generation — never a missing/partial state dir.
        t0 = time.perf_counter()
        last = _current_batch_id(out_root)
        if last is not None and batch_id <= last:
            # skip the external side effects, but still drain the batch:
            # Spark validates that foreachBatch processed every partition
            # (upstream stateful operators must commit their state stores)
            batch_df.count()
            return
        # two actions read this batch (the merged-state write and the
        # heartbeat's n_events count); without a persist each one re-runs
        # the whole stateful-assembler micro-batch — measured 69 s -> ~2/3
        # of that on the q51 drain at sf0.1
        batch_df.persist()
        b = batch_state(batch_df)
        if last is not None:
            merged = merge_states(spark.read.parquet(_gen_dir(out_root, last)), b)
        else:
            merged = b
        gen = _gen_dir(out_root, batch_id)
        merged.coalesce(1).write.mode("overwrite").parquet(gen)
        staged = spark.read.parquet(gen)
        n_convs = staged.count()
        staged.write.mode("overwrite").parquet(
            os.path.join(out_root, "snapshots", f"batch={batch_id}")
        )
        n_events = batch_df.count()
        batch_df.unpersist()
        # metrics heartbeat, deduped by batch_id (replays re-append nothing)
        mpath = os.path.join(out_root, "metrics.jsonl")
        seen = set()
        if os.path.exists(mpath):
            with open(mpath) as f:
                seen = {json.loads(line)["batch_id"] for line in f if line.strip()}
        if batch_id not in seen:
            with open(mpath, "a") as f:
                f.write(
                    json.dumps(
                        {
                            "batch_id": batch_id,
                            "events": n_events,
                            "convs": n_convs,
                            "wall_s": round(time.perf_counter() - t0, 3),
                        }
                    )
                    + "\n"
                )
        # commit point: atomic pointer replace makes this generation current
        ptr = os.path.join(out_root, "_CURRENT")
        tmp = ptr + f".tmp{batch_id}"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, ptr)

    writer = (
        assembled.writeStream.foreachBatch(_emit)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(out_root, "ckpt"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="1 second")
    return writer.start()
