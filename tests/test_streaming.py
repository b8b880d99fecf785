"""Streaming assembler vs batch assembler (SURVEY §2.9).

The streaming operator buffers out-of-order lines across micro-batches and
emits an event exactly once when complete; stragglers (end present, never
completed) are dead-lettered by processing-time timeout.
"""

from __future__ import annotations

import time

import pytest

from java9_gc_log_parser_spark.functions.parse import parse_lines
from java9_gc_log_parser_spark.operators.assemble import (
    assembled_pauses,
    assembly_dead_letters,
)
from java9_gc_log_parser_spark.operators.route import supported_types_filter
from java9_gc_log_parser_spark.sources.transcripts import synth_transcripts
from java9_gc_log_parser_spark.streaming.assembler import stream_assembled

INPUT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


@pytest.fixture(scope="module")
def stream_source(spark, sf_dir, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("stream") / "transcripts.parquet")
    # round-robin repartition scatters one event's lines across many files on
    # purpose: micro-batches then deliver them out of order across triggers
    synth_transcripts(spark, sf_dir).repartition(32).write.mode(
        "overwrite"
    ).parquet(p)
    return p


def test_streaming_matches_batch_assembly(spark, stream_source, tmp_path):
    out = stream_assembled(spark, stream_source, INPUT_SCHEMA)
    q = (
        out.writeStream.format("memory")
        .queryName("assembled_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.sql("SELECT * FROM assembled_stream")
    got_ok = sorted(
        [
            (r.conv_id, r.event_id, r.pause_type, r.offset_ms, r.duration_ms,
             r.eden_after, r.humongous_after)
            for r in got.filter("verdict = 'ok'").collect()
        ]
    )
    # every ok event emitted exactly once, despite cross-batch reordering
    batch_filtered = supported_types_filter(
        parse_lines(spark.read.parquet(stream_source))
    )
    want_ok = sorted(
        [
            (r.conv_id, r.event_id, r.pause_type, r.offset_ms, r.duration_ms,
             r.eden_after, r.humongous_after)
            for r in assembled_pauses(batch_filtered).collect()
        ]
    )
    assert got_ok == want_ok and len(got_ok) > 0
    # error groups are stragglers awaiting timeout; with availableNow (no
    # further triggers) they must NOT have been emitted
    assert got.filter("verdict <> 'ok'").count() == 0
    # ...and the batch assembler confirms they exist in this input
    assert assembly_dead_letters(batch_filtered).count() > 0


def test_straggler_timeout_dead_letter(spark, tmp_path):
    """A group with an end but no start must dead-letter after the timeout."""
    import datetime

    from pyspark.sql import Row

    src = str(tmp_path / "src")
    rows = [
        Row(conv_id="c1", turn_idx=0, role="assistant",
            text="[1.5s][info][gc] GC(7) Pause Young (G1 Evacuation Pause) "
                 "10M->5M(64M) 2.0ms",
            tool=None, ts=datetime.datetime(2024, 1, 1)),
    ]
    spark.createDataFrame(rows, INPUT_SCHEMA).write.parquet(src)

    out = stream_assembled(spark, src, INPUT_SCHEMA, timeout_ms=3000)
    q = (
        out.writeStream.format("memory")
        .queryName("straggler_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        errs = []
        while time.time() < deadline:
            # empty micro-batches keep firing, eventually the timeout trips
            errs = spark.sql(
                "SELECT * FROM straggler_stream WHERE verdict <> 'ok'"
            ).collect()
            if errs:
                break
            time.sleep(2)
    finally:
        q.stop()
    assert len(errs) == 1
    assert errs[0].verdict == "end_before_start"
    assert errs[0].event_id == 7


def test_event_time_watermark_dead_letter(spark, tmp_path):
    """Event-time lateness: a straggler dead-letters only when the WATERMARK
    (data time) moves `lateness` past it — never on wall clock — and carries
    the batch assembler's byte-identical error message. A group completed
    within the lateness window must emit ok and never dead-letter."""
    import datetime

    from pyspark.sql import Row

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def drain():
        q = (
            stream_assembled(spark, src, INPUT_SCHEMA, lateness_ms=5000)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    def read_out():
        return spark.read.parquet(out)

    rows = [
        # straggler: end with no start (GC(7), Young => needs start+regions)
        Row(conv_id="c1", turn_idx=0, role="assistant",
            text="[1.5s][info][gc           ] GC(7) Pause Young "
                 "(G1 Evacuation Pause) 10M->5M(64M) 2.0ms",
            tool=None, ts=t0),
        # complete Remark group (start+end suffice, no regions)
        Row(conv_id="c1", turn_idx=1, role="assistant",
            text="[2.0s][info][gc,start     ] GC(9) Pause Remark",
            tool=None, ts=t0),
        Row(conv_id="c1", turn_idx=2, role="assistant",
            text="[2.1s][info][gc           ] GC(9) Pause Remark "
                 "11M->10M(64M) 1.0ms",
            tool=None, ts=t0 + datetime.timedelta(seconds=2)),
    ]
    spark.createDataFrame(rows, INPUT_SCHEMA).write.mode("append").parquet(src)
    drain()
    got = read_out()
    assert got.filter("verdict = 'ok'").count() == 1  # Remark completed
    # wall clock has LONG passed 5s of event time relative to nothing —
    # but the watermark hasn't moved past t0+5s, so no dead letter yet
    assert got.filter("verdict <> 'ok'").count() == 0

    # watermark advance via ONE parseable start-only line with a later
    # event time (unmatched free text never reaches the watermark node —
    # the class filter is pushed below it; a start-only group parks as
    # dangling state that both engines silently discard). A single drain
    # suffices: the sentinel's batch advances the watermark, and Spark's
    # no-data micro-batch fires the expired timer within the same run.
    Rowi = Row(conv_id="wm", turn_idx=0, role="assistant",
               text="[99.0s][info][gc,start     ] GC(9001) Pause Young "
                    "(G1 Evacuation Pause)",
               tool=None, ts=t0 + datetime.timedelta(minutes=10))
    spark.createDataFrame([Rowi], INPUT_SCHEMA).write.mode(
        "append"
    ).parquet(src)
    drain()

    errs = read_out().filter("verdict <> 'ok'").collect()
    assert len(errs) == 1
    assert errs[0].verdict == "end_before_start"
    assert errs[0].event_id == 7
    assert errs[0].error_message == (
        "Received PauseEnd before PauseStart. Either a bug or invalid GC "
        "log. EventId: 7"
    )


def test_stream_conv_state_matches_batch_final(spark, stream_source, tmp_path):
    """After the snapshot stream drains, the cumulative state equals the
    batch conv_state_final over the same input, and every micro-batch left a
    snapshot + a metrics heartbeat line."""
    import json
    import os

    from java9_gc_log_parser_spark.operators.aggregate import conv_state_final
    from java9_gc_log_parser_spark.streaming.state_stream import (
        final_state,
        stream_conv_state,
    )

    out_root = str(tmp_path / "state_stream")
    q = stream_conv_state(spark, stream_source, INPUT_SCHEMA, out_root,
                          max_files_per_trigger=8)
    q.awaitTermination(300)

    got = sorted(map(tuple, final_state(spark, out_root).collect()))
    batch_filtered = supported_types_filter(
        parse_lines(spark.read.parquet(stream_source))
    )
    want = sorted(
        map(tuple, conv_state_final(assembled_pauses(batch_filtered)).collect())
    )
    assert got == want and len(got) > 0

    with open(os.path.join(out_root, "metrics.jsonl")) as f:
        metrics = [json.loads(line) for line in f]
    assert len(metrics) >= 2  # several micro-batches actually ran
    assert {m["batch_id"] for m in metrics} == set(range(len(metrics)))
    snapshots = os.listdir(os.path.join(out_root, "snapshots"))
    assert len(snapshots) == len(metrics)


def test_state_replay_idempotent_and_pointer_atomic(spark, stream_source, tmp_path):
    """A replayed batch_id (at-least-once foreachBatch recovery) must not
    double-count. Deleting the stream's OWN checkpoint while keeping the
    state makes the re-run re-fire every batch id from 0 — the worst-case
    replay — and every one must be skipped by the _CURRENT guard."""
    import os
    import shutil

    from java9_gc_log_parser_spark.streaming.state_stream import (
        _current_batch_id,
        final_state,
        stream_conv_state,
    )

    out_root = str(tmp_path / "state_replay")
    q = stream_conv_state(spark, stream_source, INPUT_SCHEMA, out_root,
                          max_files_per_trigger=16)
    q.awaitTermination(300)

    before = sorted(map(tuple, final_state(spark, out_root).collect()))
    last = _current_batch_id(out_root)
    assert last is not None and last >= 1
    with open(os.path.join(out_root, "metrics.jsonl")) as f:
        metrics_before = f.read()
    gens_before = sorted(os.listdir(os.path.join(out_root, "state_gens")))

    # lose the streaming engine's checkpoint, keep the applied state
    shutil.rmtree(os.path.join(out_root, "ckpt"))
    q2 = stream_conv_state(spark, stream_source, INPUT_SCHEMA, out_root,
                           max_files_per_trigger=16)
    q2.awaitTermination(300)

    assert _current_batch_id(out_root) == last
    assert sorted(map(tuple, final_state(spark, out_root).collect())) == before
    with open(os.path.join(out_root, "metrics.jsonl")) as f:
        assert f.read() == metrics_before  # heartbeat not duplicated
    assert sorted(os.listdir(os.path.join(out_root, "state_gens"))) == gens_before


def test_atleastonce_dedup_drops_redeliveries(spark, tmp_path):
    """The q55 shape on a tiny corpus: a doubled delivery (every third turn
    redelivered into different files) drains to exactly the original rows —
    and the delivery genuinely contained duplicates (non-vacuous)."""
    from pyspark.sql import functions as F

    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    tdf = synth_transcripts(spark, "/root/testdata/sf0.001")
    src = str(tmp_path / "src")
    tdf.repartition(8).write.parquet(src)
    tdf.filter(F.col("turn_idx") % 3 == 0).repartition(8).write.mode(
        "append"
    ).parquet(src)
    n_orig = tdf.count()
    n_delivered = spark.read.parquet(src).count()
    assert n_delivered > n_orig  # redeliveries really present
    lo, hi = tdf.agg(F.min("ts"), F.max("ts")).first()
    delay_s = int((hi - lo).total_seconds()) + 60
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(src)
        .withWatermark("ts", f"{delay_s} seconds")
        .dropDuplicatesWithinWatermark(["conv_id", "turn_idx"])
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == n_orig
    # row-for-row equality with the original (exceptAll both ways is empty)
    assert out.exceptAll(tdf).count() == 0
    assert tdf.exceptAll(out).count() == 0


def test_stream_window_agg_withholds_live_tail(spark, tmp_path):
    """Append-mode watermark semantics: windows past the final watermark
    (max_ts - delay) are withheld from the sink; emitted windows match the
    batch aggregation exactly."""
    import datetime as dt

    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1)
    # 3 six-hour windows of data; max ts 14:31 -> final watermark 12:31
    # with a 2h delay -> 00-06 and 06-12 emit (ends 06:00/12:00 < 12:31),
    # the 12-18 window is withheld. The watermark boundary is EXCLUSIVE
    # (a window whose end equals the watermark is withheld), so the
    # fixture keeps every window end strictly off the watermark.
    rows = []
    for h, n in ((1, 4), (7, 3), (14, 2)):
        for i in range(n):
            rows.append((f"c{i}", i, "user", "hi", None,
                         t0 + dt.timedelta(hours=h, minutes=30 * i + 1)))
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx long, role string, text string, "
        "tool string, ts timestamp",
    )
    src = str(tmp_path / "src")
    df.repartition(4).write.parquet(src)
    q = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "6 hours").alias("w"), "role")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "role", "n")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {
        (r["ws"], r["n"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == {(t0, 4), (t0 + dt.timedelta(hours=6), 3)}
    # the 12:00 window exists in the data but is past the watermark
    assert all(ws < t0 + dt.timedelta(hours=12) for ws, _ in got)


def test_stream_stream_join_pairs_across_micro_batches(spark, tmp_path):
    """The property that distinguishes a stream-stream join from a
    per-batch join: the user turn arrives in trigger 1, its assistant
    reply in trigger 2 (one file per trigger), and the pair must still be
    emitted from join state."""
    import datetime as dt

    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1)
    schema = (
        "conv_id string, turn_idx long, role string, text string, "
        "tool string, ts timestamp"
    )
    users = spark.createDataFrame(
        [("c1", 0, "user", "q", None, t0),
         ("c2", 0, "user", "q", None, t0)], schema)
    assts = spark.createDataFrame(
        [("c1", 1, "assistant", "a", None, t0 + dt.timedelta(minutes=2)),
         # out of range: 20 min > the 10-min bound -> must NOT pair
         ("c2", 1, "assistant", "a", None, t0 + dt.timedelta(minutes=20))],
        schema)
    src = str(tmp_path / "src")
    users.coalesce(1).write.parquet(src)
    assts.coalesce(1).write.mode("append").parquet(src)

    def side(role, names):
        return (
            spark.readStream.schema(users.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .filter(F.col("role") == role)
            .withWatermark("ts", "1 hour")
            .select(F.col("conv_id").alias(names[0]),
                    F.col("turn_idx").alias(names[1]),
                    F.col("ts").alias(names[2]))
        )

    q = (
        side("user", ("lc", "lt", "lts"))
        .join(
            side("assistant", ("rc", "rt", "rts")),
            F.expr("lc = rc AND rts >= lts "
                   "AND rts < lts + INTERVAL 10 MINUTES"),
        )
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {(r["lc"], r["rt"])
           for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got == {("c1", 1)}  # cross-batch pair found, out-of-range absent


def test_stream_cms_maintenance_is_truly_incremental(spark, sf_dir):
    """The drained incremental grid equals the batch grid cell-for-cell AND
    the run really went through multiple merge generations (not one big
    batch)."""
    import glob
    import os

    import __spark_entry__ as entrymod
    from java9_gc_log_parser_spark.operators.sketches import cms_sketch

    got = sorted(
        map(tuple, entrymod.q67_stream_cms_maintenance(spark, sf_dir).collect())
    )
    want = sorted(
        map(
            tuple,
            cms_sketch(spark.read.parquet(f"{sf_dir}/documents.parquet"))
            .selectExpr(
                "cast(row as int) row",
                "cast(bucket as int) bucket",
                "cast(total as long) total",
            )
            .collect(),
        )
    )
    assert got == want and len(got) > 0
    root = entrymod._scratch(sf_dir, "q67")
    gens = glob.glob(os.path.join(root, "gens", "batch=*"))
    assert len(gens) >= 2, gens  # merge path exercised across micro-batches
