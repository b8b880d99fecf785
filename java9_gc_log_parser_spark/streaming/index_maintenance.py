"""Streaming IVF×PQ index maintenance (q141's engine, factored out so the
crash/resume path is testable in isolation).

The maintained index is a generation store under ``out_root``:

    base/cell=K/        batch-encoded bootstrap generation (written once,
                        before the stream starts — the planned-rebuild
                        artifact)
    batch=N/cell=K/     per-micro-batch appends: the vectors of batch N
                        encoded against the FIXED index metadata
    _CURRENT            atomic pointer: last durably-applied batch id

Fault-tolerance contract (the ST3 north-rule discipline, same as
``state_stream`` / q67): foreachBatch is at-least-once, so each
generation is keyed by batch_id and committed via an atomic pointer
replace; a replayed ``batch_id <= _CURRENT`` is drained without side
effects, and a crash between the generation write and the pointer flip
re-runs the batch with ``mode("overwrite")`` — idempotent either way.
``fail_after`` injects a crash between batches so the resume path is
exercised by a real test, not asserted in prose.

Scale shape (100 TB/day of arriving vectors): per-batch cost is batch
rows × a few KB of broadcast metadata (``ivfpq_encode``'s plan is
corpus-scan-free, pinned in tests/test_plans.py); the corpus is never
re-read, the index grows append-only and partition-pruned by cell, and
codebooks never move — re-training is a planned base rebuild, after
which this store starts a new lineage.

Reference parity: GcService.scala:35-38 has NO fault tolerance (stream
dies on exception); this module is the resumable replacement the north
rule requires.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from java9_gc_log_parser_spark.operators.similarity import ivfpq_encode

__all__ = [
    "current_generation",
    "write_base_generation",
    "maintain_index",
    "read_index",
]


def current_generation(out_root: str) -> int | None:
    ptr = os.path.join(out_root, "_CURRENT")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return int(f.read().strip())


def write_base_generation(
    base: DataFrame, cells: DataFrame, books: DataFrame, out_root: str
) -> None:
    """Encode the bootstrap corpus once and lay it down as the base
    generation, partitioned by cell (the index's prune key)."""
    ivfpq_encode(base, cells, books).write.partitionBy("cell").parquet(
        f"{out_root}/base"
    )


def maintain_index(
    spark: SparkSession,
    source_path: str,
    input_schema,
    out_root: str,
    cells_rows,
    cells_schema,
    books_rows,
    books_schema,
    max_files_per_trigger: int = 2,
    timeout_s: int = 600,
    fail_after: int | None = None,
) -> None:
    """Drain the vector stream, appending one encoded generation per
    micro-batch; blocks until the availableNow backlog is done.

    Metadata arrives as COLLECTED rows + schema (not DataFrames): that is
    what pins the no-corpus-lineage property — the per-batch encode plan
    physically cannot re-scan the corpus because nothing in scope refers
    to it. ``fail_after=N`` raises after N new generations are applied
    (simulated crash between batches); rerunning without it resumes from
    the checkpoint and must drain replayed ids without re-applying them.
    """
    os.makedirs(out_root, exist_ok=True)
    ptr = os.path.join(out_root, "_CURRENT")
    applied_this_run = 0

    def _emit(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal applied_this_run
        last = current_generation(out_root)
        if last is not None and batch_id <= last:
            batch_df.count()  # drain the replayed batch, side effects skipped
            return
        if fail_after is not None and applied_this_run >= fail_after:
            raise RuntimeError(
                f"injected crash before batch {batch_id} "
                f"(applied {applied_this_run} this run)"
            )
        enc = ivfpq_encode(
            batch_df,
            spark.createDataFrame(cells_rows, cells_schema),
            spark.createDataFrame(books_rows, books_schema),
        )
        enc.write.partitionBy("cell").mode("overwrite").parquet(
            f"{out_root}/batch={batch_id}"
        )
        tmp = ptr + f".tmp{batch_id}"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, ptr)
        applied_this_run += 1

    q = (
        spark.readStream.schema(input_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
        .writeStream.foreachBatch(_emit)
        .option("checkpointLocation", f"{out_root}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(f"index stream did not drain within {timeout_s}s")


def read_index(spark: SparkSession, out_root: str) -> DataFrame:
    """The maintained index: base generation plus every committed append.

    Each generation dir is read on its own (recovering its ``cell=K``
    partition dirs); a wholesale read of ``out_root`` would misparse the
    ``batch=N`` dir names as a partition column."""
    final = current_generation(out_root)
    gens = [f"{out_root}/base"] + (
        [f"{out_root}/batch={i}" for i in range(int(final) + 1)]
        if final is not None
        else []
    )
    idx = spark.read.parquet(gens[0])
    for g in gens[1:]:
        idx = idx.unionByName(spark.read.parquet(g))
    return idx
