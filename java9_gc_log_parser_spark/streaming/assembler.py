"""Structured Streaming variant of the pipeline (SURVEY §2.9).

The reference's live mode tails a file every second
(``GcLogStream.scala:45-51``) through a strictly order-dependent assembler.
A distributed stream cannot assume order — lines of one GC event may arrive
across micro-batches, in any order. The streaming assembler is therefore an
``applyInPandasWithState`` operator keyed by (conv_id, event_id) that
**buffers until the event is complete** (start + end + regions, or start+end
for Remark), emits exactly one ok row, and clears state. Groups that received
their PauseEnd but stay incomplete are stragglers: a processing-time timeout
dead-letters them with the same verdicts as the batch assembler
(end_before_start / missing_regions), mirroring the batch operator's
order-free group semantics (operators/assemble.py) — a group errors iff it
has an end but no start / not all regions, ever.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

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
    ]
)

_REGIONS = ("Eden", "Survivor", "Old", "Humongous")


def _make_assemble_fn(timeout_ms: int | None):
    def fn(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        conv_id, event_id = key

        if state.exists:
            st = list(state.get)
        else:
            st = [False, None, None, None, None, False,
                  None, None, None, None, None, None, None]
        (has_start, eden, survivor, old, humongous, has_end,
         p_type, p_reason, p_off, p_dur, p_hb, p_ha, p_ht) = st
        regions = dict(zip(_REGIONS, (eden, survivor, old, humongous)))

        def emit(verdict: str) -> "pd.DataFrame":
            ok = verdict == "ok"
            remark = ok and p_type == "Remark"
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
                p_hb, p_ha, p_ht,
            )
        )
        if timeout_ms is not None and has_end:
            # only end-bearing groups can become dead letters; end-less
            # dangling groups are silently discarded, like batch
            state.setTimeoutDuration(timeout_ms)

    return fn


def stream_assembled(
    spark,
    source_path: str,
    input_schema: T.StructType | str,
    timeout_ms: int | None = None,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """readStream over the transcripts dir -> parse -> filter -> stateful
    assembly. ``timeout_ms`` enables straggler dead-lettering (requires a
    continuous trigger to actually fire)."""
    stream = (
        spark.readStream.schema(input_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
    )
    filtered = supported_types_filter(parse_lines(stream)).filter(
        F.col("event_id").isNotNull()
    )
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        filtered.select(
            "conv_id", "turn_idx", "event_id", "event_class", "pause_type",
            "reason", "offset_ms", "duration_ms", "heap_before", "heap_after",
            "heap_total", "region", "region_after",
        )
        .groupBy("conv_id", "event_id")
        .applyInPandasWithState(
            _make_assemble_fn(timeout_ms),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            timeout_conf,
        )
    )
