"""Structured Streaming variant of the pipeline (SURVEY §2.9).

The reference's live mode tails a file every second
(``GcLogStream.scala:45-51``) through a strictly order-dependent assembler.
A distributed stream cannot assume order — lines of one GC event may arrive
across micro-batches, in any order. The streaming assembler is therefore an
``applyInPandasWithState`` operator keyed by (conv_id, event_id) that
**buffers until the event is complete** (start + end + regions, or start+end
for Remark), emits exactly one ok row, and clears state. Groups that received
their PauseEnd but stay incomplete are stragglers, dead-lettered with the
same verdicts AND byte-identical error messages as the batch assembler
(end_before_start / missing_regions), mirroring the batch operator's
order-free group semantics (operators/assemble.py) — a group errors iff it
has an end but no start / not all regions, ever.

Two lateness disciplines (SURVEY §2.9 ST2):

  * **event-time watermark** (``lateness_ms``, the primary path): the parsed
    stream carries ``withWatermark("ts", lateness)`` and incomplete
    end-bearing groups set an EventTimeTimeout at
    ``max(group's max event ts) + lateness``. A straggler is declared dead
    only when the *data itself* has moved ``lateness`` past it — wall-clock
    stalls, backlogs and replays cannot mis-fire it, and the decision is
    deterministic given the event times (oracle-checked end to end by
    q49_stream_late_dead_letter against the batch assembler's verdicts).
    The watermark is DRIVEN BY SUPPORTED EVENT LINES: the watermark node is
    declared after parse, but Catalyst's predicate pushdown moves the
    class/event-id filter below it (the predicates don't reference ``ts``),
    so free-text/unmatched rows do not advance event time — only GC event
    lines do, which is the meaningful clock here (measured: an unmatched
    row leaves the progress eventTime stats empty). To advance the
    watermark without affecting assembly, feed a parseable line of a fresh
    (conv, event) group with no PauseEnd — it parks as dangling state,
    which both engines silently discard.
  * **processing-time timeout** (``timeout_ms``, kept as the ops fallback):
    dead-letters on wall clock; appropriate only when event time is absent
    or untrusted.

Dangling groups (no PauseEnd, ever) time out under NEITHER discipline — the
batch assembler silently discards them at end of input and the reference
drops unfinished buffers at stream end; a timer would invent a dead letter
the batch semantics don't have.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.grammar import ERR_END_BEFORE_START, ERR_MISSING_REGIONS
from ..functions.parse import parse_lines
from ..operators.route import supported_types_filter

if TYPE_CHECKING:
    import pandas as pd

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("event_id", T.IntegerType()),
        T.StructField("verdict", T.StringType()),
        T.StructField("pause_type", T.StringType()),
        T.StructField("reason", T.StringType()),
        T.StructField("offset_ms", T.LongType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("heap_before", T.LongType()),
        T.StructField("heap_after", T.LongType()),
        T.StructField("heap_total", T.LongType()),
        T.StructField("eden_after", T.LongType()),
        T.StructField("survivor_after", T.LongType()),
        T.StructField("old_after", T.LongType()),
        T.StructField("humongous_after", T.LongType()),
        T.StructField("error_message", T.StringType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("has_start", T.BooleanType()),
        T.StructField("eden", T.LongType()),
        T.StructField("survivor", T.LongType()),
        T.StructField("old", T.LongType()),
        T.StructField("humongous", T.LongType()),
        T.StructField("has_end", T.BooleanType()),
        T.StructField("pause_type", T.StringType()),
        T.StructField("reason", T.StringType()),
        T.StructField("offset_ms", T.LongType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("heap_before", T.LongType()),
        T.StructField("heap_after", T.LongType()),
        T.StructField("heap_total", T.LongType()),
        T.StructField("max_ts_ms", T.LongType()),
    ]
)

_REGIONS = ("Eden", "Survivor", "Old", "Humongous")


def _make_assemble_fn(timeout_ms: int | None, lateness_ms: int | None = None):
    def fn(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        conv_id, event_id = key

        if state.exists:
            st = list(state.get)
        else:
            st = [False, None, None, None, None, False,
                  None, None, None, None, None, None, None, None]
        (has_start, eden, survivor, old, humongous, has_end,
         p_type, p_reason, p_off, p_dur, p_hb, p_ha, p_ht, max_ts_ms) = st
        regions = dict(zip(_REGIONS, (eden, survivor, old, humongous)))

        def emit(verdict: str) -> "pd.DataFrame":
            ok = verdict == "ok"
            remark = ok and p_type == "Remark"
            if verdict == "end_before_start":
                err = ERR_END_BEFORE_START.format(event_id=int(event_id))
            elif verdict == "missing_regions":
                present = ",".join(
                    r for r in _REGIONS if regions[r] is not None
                )
                err = ERR_MISSING_REGIONS.format(
                    regions=present, event_id=int(event_id)
                )
            else:
                err = None
            return pd.DataFrame(
                [
                    {
                        "conv_id": conv_id,
                        "event_id": int(event_id),
                        "verdict": verdict,
                        "pause_type": p_type if ok else None,
                        "reason": p_reason if ok else None,
                        "offset_ms": p_off if ok else None,
                        "duration_ms": p_dur if ok else None,
                        "heap_before": p_hb if ok else None,
                        "heap_after": p_ha if ok else None,
                        "heap_total": p_ht if ok else None,
                        "eden_after": regions["Eden"] if ok and not remark else None,
                        "survivor_after": regions["Survivor"]
                        if ok and not remark
                        else None,
                        "old_after": regions["Old"] if ok and not remark else None,
                        "humongous_after": regions["Humongous"]
                        if ok and not remark
                        else None,
                        "error_message": err,
                    }
                ]
            )

        if state.hasTimedOut:
            # straggler dead-letter: end arrived, completion never did
            verdict = "end_before_start" if not has_start else "missing_regions"
            state.remove()
            yield emit(verdict)
            return

        # vectorized fold: per event-class the merge is "last in turn order
        # wins", so boolean masks + groupby-last replace any per-row loop
        # (groups are small, but the module standard is no row-at-a-time)
        for pdf in pdfs:
            pdf = pdf.sort_values("turn_idx")
            ec = pdf["event_class"]
            if lateness_ms is not None and len(pdf):
                batch_max = pdf["ts"].max()
                if pd.notna(batch_max):
                    bm_ms = int(batch_max.value // 1_000_000)
                    max_ts_ms = bm_ms if max_ts_ms is None else max(
                        max_ts_ms, bm_ms
                    )
            has_start = has_start or bool((ec == "pause_start").any())
            nr = pdf.loc[ec == "nr_regions", ["region", "region_after"]]
            if len(nr):
                last_per_region = nr.groupby("region")["region_after"].last()
                for rname, rafter in last_per_region.items():
                    regions[rname] = int(rafter)
            ends = pdf.loc[ec == "pause_end"]
            if len(ends):
                has_end = True
                end = ends.iloc[-1]
                p_type = end["pause_type"]
                p_reason = end["reason"]
                p_off = int(end["offset_ms"])
                p_dur = float(end["duration_ms"])
                p_hb, p_ha, p_ht = (
                    int(end["heap_before"]),
                    int(end["heap_after"]),
                    int(end["heap_total"]),
                )

        complete = (
            has_end
            and has_start
            and (p_type == "Remark" or all(regions[r] is not None for r in _REGIONS))
        )
        if complete:
            state.remove()
            yield emit("ok")
            return

        state.update(
            (
                has_start, regions["Eden"], regions["Survivor"], regions["Old"],
                regions["Humongous"], has_end, p_type, p_reason, p_off, p_dur,
                p_hb, p_ha, p_ht, max_ts_ms,
            )
        )
        # only end-bearing groups can become dead letters; end-less
        # dangling groups are silently discarded, like batch
        if has_end:
            if lateness_ms is not None:
                # event-time expiry: the group is a straggler once the
                # watermark moves `lateness` past its newest event. A group
                # first seen when the watermark already passed its deadline
                # must still get a FUTURE timestamp (Spark rejects timers at
                # or behind the watermark), hence the wm+1 floor — it fires
                # at the next watermark advance.
                wm = state.getCurrentWatermarkMs()
                deadline = (max_ts_ms or 0) + lateness_ms
                state.setTimeoutTimestamp(max(deadline, wm + 1))
            elif timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)

    return fn


def stream_assembled(
    spark,
    source_path: str,
    input_schema: T.StructType | str,
    timeout_ms: int | None = None,
    lateness_ms: int | None = None,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """readStream over the transcripts dir -> parse -> filter -> stateful
    assembly.

    ``lateness_ms`` enables EVENT-TIME straggler dead-lettering: a watermark
    of that delay on the parsed stream's ``ts`` plus an EventTimeTimeout per
    incomplete end-bearing group (fires when the watermark passes the group's
    newest event + lateness). ``timeout_ms`` is the processing-time fallback
    (requires a continuous trigger to actually fire); the two are mutually
    exclusive."""
    if timeout_ms is not None and lateness_ms is not None:
        raise ValueError("pass either lateness_ms (event time) or "
                         "timeout_ms (processing time), not both")
    stream = (
        spark.readStream.schema(input_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
    )
    parsed = parse_lines(stream)
    if lateness_ms is not None:
        # watermark BEFORE the supported-types filter: every observed input
        # row advances event time, exactly like a file tail's read position
        parsed = parsed.withWatermark("ts", f"{int(lateness_ms)} milliseconds")
    filtered = supported_types_filter(parsed).filter(
        F.col("event_id").isNotNull()
    )
    if lateness_ms is not None:
        timeout_conf = GroupStateTimeout.EventTimeTimeout
    elif timeout_ms is not None:
        timeout_conf = GroupStateTimeout.ProcessingTimeTimeout
    else:
        timeout_conf = GroupStateTimeout.NoTimeout
    return (
        filtered.select(
            "conv_id", "turn_idx", "event_id", "event_class", "pause_type",
            "reason", "offset_ms", "duration_ms", "heap_before", "heap_after",
            "heap_total", "region", "region_after", "ts",
        )
        .groupBy("conv_id", "event_id")
        .applyInPandasWithState(
            _make_assemble_fn(timeout_ms, lateness_ms),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            timeout_conf,
        )
    )
