"""End-to-end pipeline composition (reference E1 lifecycle, SURVEY §3).

parse -> supported-types filter -> enrich -> route (3 sinks) -> assemble ->
aggregate. The parsed DataFrame is persisted before fan-out so the parse
stage executes exactly once for all sinks (SURVEY §4: one-pass fan-out —
without the persist, Spark would re-run the scan+parse per sink action).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.parse import parse_lines
from ..operators.assemble import assembled_pauses, assembly_dead_letters
from ..operators.aggregate import (
    bucket_pause_stats,
    bucket_turn_counts,
    conv_state_final,
    conv_state_scan,
    duration_histogram,
)
from ..operators.route import route, supported_types_filter


def build(transcripts: DataFrame, persist: bool = True) -> dict[str, DataFrame]:
    """Compose every stage; returns the named DataFrames (lazily planned).

    Keys: parsed, pause_events, tool_calls, unmatched, dead_letter (grammar
    unmatched + assembly errors unified), assembled, conv_state,
    conv_state_scan, bucket_turns, bucket_pauses, dur_histogram.
    """
    parsed = parse_lines(transcripts)
    if persist:
        parsed = parsed.persist(StorageLevel.MEMORY_AND_DISK)

    sinks = route(parsed)
    filtered = supported_types_filter(parsed)
    assembled = assembled_pauses(filtered)
    dead = assembly_dead_letters(filtered)

    # unified dead-letter sink: grammar-unmatched rows + assembly-error groups
    # (FIXTURES.md §3 unmatched sink definition)
    dead_letter = sinks["unmatched"].unionByName(
        dead.select(
            "conv_id",
            F.lit(None).cast("int").alias("turn_idx"),
            F.col("error_message").alias("text"),
            F.col("error_code").alias("reason_code"),
            "ts",
        )
    )

    return {
        "parsed": parsed,
        "pause_events": sinks["pause_events"],
        "tool_calls": sinks["tool_calls"],
        "unmatched": sinks["unmatched"],
        "assembly_errors": dead,
        "dead_letter": dead_letter,
        "assembled": assembled,
        "conv_state": conv_state_final(assembled),
        "conv_state_scan": conv_state_scan(assembled),
        "bucket_turns": bucket_turn_counts(transcripts),
        "bucket_pauses": bucket_pause_stats(assembled),
        "dur_histogram": duration_histogram(assembled),
    }
