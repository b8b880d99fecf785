"""Supported-types filter + event-class fan-out routing (SURVEY §2.3).

F1: the reference keeps only PauseStart/PauseEnd whose type is in
{Full, Young, InitialMark, Remark, Mixed} plus all NrRegions lines
(``GcLogStream.scala:21-27``). **Cleanup is deliberately absent** — `Pause
Cleanup` lines are parsed but silently dropped, so the `cleanups` counter can
never increment through the full pipeline (quirk parity; tested).

F2: the implicit dead-letter of the reference becomes explicit fan-out: one
filtered projection per sink from a single cached parsed DataFrame, so the
parse stage executes once for all sinks (SURVEY §4 "one-pass fan-out").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.grammar import SUPPORTED_PAUSE_TYPES
from .enrich import enrich

SINKS = ("pause_events", "tool_calls", "unmatched")


def supported_types_filter(parsed: DataFrame) -> DataFrame:
    """Replicates GcLogStream.supportedTypesFilter (Cleanup excluded)."""
    return parsed.filter(
        (F.col("event_class") == "nr_regions")
        | (
            F.col("event_class").isin("pause_start", "pause_end")
            & F.col("pause_type").isin(*SUPPORTED_PAUSE_TYPES)
        )
    )


def route(parsed: DataFrame) -> dict[str, DataFrame]:
    """Fan out one parsed DataFrame into the three sink DataFrames.

    Caller is responsible for persisting `parsed` before materializing more
    than one sink (plans/pipeline.py does; verified by explain in tests).
    """
    pause_events = supported_types_filter(parsed).transform(enrich).select(
        "conv_id",
        "turn_idx",
        "event_id",
        "event_class",
        "pause_type",
        "reason",
        "offset_ms",
        "heap_before",
        "heap_after",
        "heap_total",
        "duration_ms",
        "region",
        "region_before",
        "region_after",
        "role_group",
        "tool_family",
        "ts",
    )

    tool_calls = (
        parsed.filter(F.col("tool").isNotNull())
        .transform(lambda d: enrich(d, with_role=False))
        .select("conv_id", "turn_idx", "tool", "tool_family", "is_side_effecting", "ts")
    )

    unmatched = parsed.filter(F.col("event_class") == "unmatched").select(
        "conv_id", "turn_idx", "text", "reason_code", "ts"
    )

    return {
        "pause_events": pause_events,
        "tool_calls": tool_calls,
        "unmatched": unmatched,
    }
