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


def final_state(spark: SparkSession, out_root: str) -> DataFrame:
    """The exposed cumulative state (merge internals dropped, nulls zeroed
    like ``GcState``'s zero-initialised generation sizes)."""
    df = spark.read.parquet(os.path.join(out_root, "state"))
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
      state/                 current cumulative state (overwritten per batch)
      snapshots/batch=N/     the state as of batch N (the SSE "event" feed)
      metrics.jsonl          one heartbeat line per micro-batch
    """
    assembled = stream_assembled(
        spark, source_path, input_schema,
        max_files_per_trigger=max_files_per_trigger,
    ).filter(F.col("verdict") == "ok")

    state_dir = os.path.join(out_root, "state")
    os.makedirs(out_root, exist_ok=True)

    def _emit(batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.perf_counter()
        b = batch_state(batch_df)
        if os.path.exists(state_dir):
            prev = spark.read.parquet(state_dir)
            merged = merge_states(prev, b)
        else:
            merged = b
        # two-phase write: merged reads the *current* state dir lazily, so it
        # must be materialized to a staging dir before that dir is replaced
        tmp = state_dir + "_next"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        staged = spark.read.parquet(tmp)
        n_convs = staged.count()
        staged.write.mode("overwrite").parquet(
            os.path.join(out_root, "snapshots", f"batch={batch_id}")
        )
        staged.write.mode("overwrite").parquet(state_dir)
        n_events = batch_df.count()
        with open(os.path.join(out_root, "metrics.jsonl"), "a") as f:
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
