"""Cumulative state + rollup aggregations (SURVEY §2.5 G1/G2/G3).

G1 ``conv_state_scan``: the reference's running fold ``GcStateFlow``
(``GcStateFlow.scala:13-37``) emits one cumulative GcState per event — a
prefix scan, not a grouped agg. Spark-first: a window over
``(conv_id ORDER BY offset_ms, event_id)`` with per-type running counters and
``last(..., ignorenulls)`` carry-forward. RemarkPause updates the heap but
*keeps previous generation sizes* (``GcStateFlow.scala:28-29``) — reproduced
by feeding nulls for Remark rows into the carry-forward.

G2 ``conv_state_final``: the final snapshot per conversation = grouped
counters + last sizes. Implemented as a *salted two-phase aggregation*
(phase 1 groups on (conv_id, salt), phase 2 re-aggregates per conv_id) to
defuse the hot-conv skew the north rule calls out. For algebraic aggs Spark's
map-side partial aggregation already bounds per-key work; the salted shape
matters once holistic aggs (exact percentiles, collect_*) enter, and it keeps
reducer-side hash tables balanced under extreme key skew.

G3 rollups (target-only): per-time-bucket turn counts, pause-duration
histograms, exact p99 latency.

The ``cleanups`` counter exists for parity with GcState
(``GcStateModel.scala:8-17``) but can never increment through the full
pipeline because the supported-types filter drops Cleanup pauses
(quirk, ``GcLogStream.scala:21``); feeding assembled Cleanup events directly
does increment it (tested, mirroring ``GcStateFlowTest.scala:86-100``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: GcState counter -> pause type (GcStateFlow.scala:18-29)
COUNTERS = {
    "full_gcs": "Full",
    "young_gcs": "Young",
    "initial_marks": "InitialMark",
    "remarks": "Remark",
    "mixed": "Mixed",
    "cleanups": "Cleanup",
}

GEN_COLS = ["eden_after", "survivor_after", "old_after", "humongous_after"]


def conv_state_scan(assembled: DataFrame) -> DataFrame:
    """G1: one cumulative GcState row per assembled event (prefix scan)."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("offset_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pt = F.col("pause_type")
    not_remark = pt != "Remark"

    out = assembled.select(
        "conv_id",
        "event_id",
        F.col("offset_ms").alias("time_offset_ms"),
        *[
            F.sum((pt == t).cast("long")).over(w).alias(name)
            for name, t in COUNTERS.items()
        ],
        F.col("heap_after").alias("heap_size"),
        F.col("heap_total"),
        *[
            F.coalesce(
                F.last(F.when(not_remark, F.col(c)), ignorenulls=True).over(w),
                F.lit(0),
            ).alias(c)
            for c in GEN_COLS
        ],
    )
    return out


def _salt(n_salts: int) -> Column:
    # deterministic spreading key; any per-row value works, hash keeps it
    # uniform even if turn/event ids cluster
    return F.pmod(F.xxhash64("event_id"), F.lit(n_salts))


def conv_state_final(assembled: DataFrame, n_salts: int = 16) -> DataFrame:
    """G2: final GcState per conversation via salted two-phase aggregation."""
    pt = F.col("pause_type")
    not_remark_key = F.when(pt != "Remark", F.col("offset_ms"))

    phase1 = assembled.withColumn("_salt", _salt(n_salts)).groupBy(
        "conv_id", "_salt"
    )
    p1 = phase1.agg(
        *[
            F.sum((pt == t).cast("long")).alias(f"_{name}")
            for name, t in COUNTERS.items()
        ],
        F.max("offset_ms").alias("_max_off"),
        F.max_by("heap_after", "offset_ms").alias("_heap_size"),
        F.max_by("heap_total", "offset_ms").alias("_heap_total"),
        F.max(not_remark_key).alias("_max_nr_off"),
        *[
            F.max_by(F.col(c), not_remark_key).alias(f"_{c}")
            for c in GEN_COLS
        ],
    )
    out = p1.groupBy("conv_id").agg(
        *[F.sum(f"_{name}").alias(name) for name in COUNTERS],
        F.max("_max_off").alias("time_offset_ms"),
        F.max_by("_heap_size", "_max_off").alias("heap_size"),
        F.max_by("_heap_total", "_max_off").alias("heap_total"),
        *[
            F.coalesce(F.max_by(f"_{c}", "_max_nr_off"), F.lit(0)).alias(c)
            for c in GEN_COLS
        ],
    )
    return out


def conv_state_json(conv_state: DataFrame) -> DataFrame:
    """GcState JSON serialization parity (``GcStateJson.scala:7-12``): the
    reference pushes each cumulative GcState over SSE as spray-json of the
    case classes (``GcStateModel.scala:8-27``), whose field names and nesting
    this struct mirrors exactly — {"timeOffset":{"millis":..},counters..,
    "heapSize":{"size","total"},"generationSizes":{"eden","survivor","old",
    "humongous"}}. ``to_json`` runs JVM-side (codegen, no Python)."""
    st = F.struct(
        F.struct(
            F.col("time_offset_ms").cast("long").alias("millis")
        ).alias("timeOffset"),
        F.col("full_gcs").alias("fullGcs"),
        F.col("young_gcs").alias("youngGcs"),
        F.col("initial_marks").alias("initialMarks"),
        F.col("remarks").alias("remarks"),
        F.col("mixed").alias("mixed"),
        F.col("cleanups").alias("cleanups"),
        F.struct(
            F.col("heap_size").cast("long").alias("size"),
            F.col("heap_total").cast("long").alias("total"),
        ).alias("heapSize"),
        F.struct(
            F.col("eden_after").cast("long").alias("eden"),
            F.col("survivor_after").cast("long").alias("survivor"),
            F.col("old_after").cast("long").alias("old"),
            F.col("humongous_after").cast("long").alias("humongous"),
        ).alias("generationSizes"),
    )
    return conv_state.select("conv_id", F.to_json(st).alias("state_json"))


def bucket_turn_counts(transcripts: DataFrame, bucket: str = "hour") -> DataFrame:
    """G3a: turns per time bucket (map-side combinable; AQE handles skew)."""
    return (
        transcripts.groupBy(F.date_trunc(bucket, "ts").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("turn_count"))
    )


def bucket_pause_stats(assembled: DataFrame, bucket: str = "hour") -> DataFrame:
    """G3b: per-bucket pause count, mean and exact p99 duration.

    Exactness contract: durations carry exactly 3 decimals, so the mean
    is SUM(exact milli BIGINT) / (1000 * count) — a deterministic double
    from identical integers in both engines, with NO final ROUND
    (AVG(double) sums in partition order, and F.round's shortest-decimal
    tie handling diverged from DuckDB's binary ROUND at sf0.1). The p99
    is the exact interpolating percentile over the SAME milli integers
    (the q73 bit-equality contract with quantile_cont), divided once at
    the boundary, also un-rounded.
    """
    return (
        assembled.withColumn(
            "_milli", F.round(F.col("duration_ms") * 1000).cast("long")
        )
        .groupBy(F.date_trunc(bucket, "ts").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("pause_count"),
            (
                F.sum("_milli").cast("double")
                / (F.count(F.lit(1)) * F.lit(1000)).cast("double")
            ).alias("mean_ms"),
            (F.percentile("_milli", 0.99) / F.lit(1000.0)).alias("p99_ms"),
        )
    )


def sessionize(transcripts: DataFrame, gap_s: int = 3600) -> DataFrame:
    """Gap-based sessionization: split each conversation into sessions
    wherever the inter-turn idle time exceeds ``gap_s`` seconds, and roll up
    one row per session.

    The classic log-pipeline operator the reference's single-file model never
    needed (one JVM = one "session"), but which any multi-tenant transcript
    store does. Two windows over the same ``(conv_id ORDER BY turn_idx)``
    partitioning — lag to mark boundaries, running sum to number sessions —
    so Spark plans ONE shuffle + ONE sort and both windows reuse it; the
    final rollup groups by (conv_id, session_idx), a superset key of the
    window partition, so AQE keeps it co-partitioned. Hot conversations skew
    a window partition, but per-row window state is O(1) here and the
    downstream agg is algebraic (map-side combinable).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    is_new = F.when(gap > gap_s, F.lit(1)).otherwise(F.lit(0))
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = transcripts.select(
        "conv_id",
        "ts",
        F.sum(is_new).over(wrun).cast("int").alias("session_idx"),
    )
    return sess.groupBy("conv_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        .cast("long")
        .alias("duration_s"),
    )


def duration_histogram(assembled: DataFrame, bin_ms: float = 10.0) -> DataFrame:
    """G3c: pause-duration histogram (fixed-width bins)."""
    return (
        assembled.groupBy(
            F.floor(F.col("duration_ms") / bin_ms).cast("long").alias("dur_bucket")
        )
        .agg(F.count(F.lit(1)).alias("pause_count"))
    )
