"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` carries the DuckDB
equivalent. The transcripts input is synthesized from the ``events`` parquet
via SQL shared verbatim between both engines
(java9_gc_log_parser_spark/sources/transcripts.py), and the oracle re-derives
expected outputs from the generative parameters — independent of the Spark
regex parse (java9_gc_log_parser_spark/oracle.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from java9_gc_log_parser_spark import oracle as O  # noqa: E402
from java9_gc_log_parser_spark.functions.parse import parse_lines  # noqa: E402
from java9_gc_log_parser_spark.operators.aggregate import (  # noqa: E402
    bucket_pause_stats,
    bucket_turn_counts,
    conv_state_final,
    conv_state_scan,
    duration_histogram,
)
from java9_gc_log_parser_spark.operators.assemble import (  # noqa: E402
    assembled_pauses,
    assembly_dead_letters,
)
from java9_gc_log_parser_spark.operators.route import (  # noqa: E402
    route,
    supported_types_filter,
)
from java9_gc_log_parser_spark.sources.transcripts import synth_transcripts  # noqa: E402

_CACHE: dict[tuple[int, str], DataFrame] = {}


def _parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (id(spark), sf_dir)
    if key not in _CACHE:
        df = parse_lines(synth_transcripts(spark, sf_dir)).persist()
        _CACHE[key] = df
    return _CACHE[key]


def _assembled(spark: SparkSession, sf_dir: str) -> DataFrame:
    return assembled_pauses(supported_types_filter(_parsed(spark, sf_dir)))


# --------------------------------------------------------------------------
# Spark queries
# --------------------------------------------------------------------------

def q01_parse_classify(spark, sf_dir):
    return (
        _parsed(spark, sf_dir)
        .groupBy("event_class")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q02_pause_end_fields(spark, sf_dir):
    return _parsed(spark, sf_dir).filter(F.col("event_class") == "pause_end").select(
        "conv_id", "turn_idx", "event_id", "pause_type", "reason", "offset_ms",
        "heap_before", "heap_after", "heap_total", "duration_ms",
    )


def q03_pause_events_sink(spark, sf_dir):
    return route(_parsed(spark, sf_dir))["pause_events"]


def q04_tool_calls_sink(spark, sf_dir):
    return route(_parsed(spark, sf_dir))["tool_calls"]


def q05_unmatched_sink(spark, sf_dir):
    return route(_parsed(spark, sf_dir))["unmatched"]


def q06_assembled_pauses(spark, sf_dir):
    return _assembled(spark, sf_dir)


def q07_assembly_errors(spark, sf_dir):
    return assembly_dead_letters(supported_types_filter(_parsed(spark, sf_dir)))


def q08_conv_state_final(spark, sf_dir):
    return conv_state_final(_assembled(spark, sf_dir))


def q09_conv_state_scan(spark, sf_dir):
    return conv_state_scan(_assembled(spark, sf_dir))


def q10_bucket_turn_counts(spark, sf_dir):
    return bucket_turn_counts(synth_transcripts(spark, sf_dir))


def q11_bucket_pause_stats(spark, sf_dir):
    return bucket_pause_stats(_assembled(spark, sf_dir))


def q12_duration_histogram(spark, sf_dir):
    return duration_histogram(_assembled(spark, sf_dir))


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

_COUNTER_SQL = ",\n  ".join(
    f"CAST(SUM(CASE WHEN pause_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS {name}"
    for name, t in [
        ("full_gcs", "Full"), ("young_gcs", "Young"),
        ("initial_marks", "InitialMark"), ("remarks", "Remark"),
        ("mixed", "Mixed"), ("cleanups", "Cleanup"),
    ]
)

_COUNTER_WIN_SQL = ",\n  ".join(
    f"CAST(SUM(CASE WHEN pause_type = '{t}' THEN 1 ELSE 0 END) OVER w AS BIGINT)"
    f" AS {name}"
    for name, t in [
        ("full_gcs", "Full"), ("young_gcs", "Young"),
        ("initial_marks", "InitialMark"), ("remarks", "Remark"),
        ("mixed", "Mixed"), ("cleanups", "Cleanup"),
    ]
)

_GEN_FINAL_SQL = ",\n  ".join(
    f"COALESCE(arg_max({c}, CASE WHEN pause_type <> 'Remark' THEN offset_ms END), 0)"
    f" AS {c}"
    for c in ["eden_after", "survivor_after", "old_after", "humongous_after"]
)

_GEN_WIN_SQL = ",\n  ".join(
    f"COALESCE(last_value(CASE WHEN pause_type <> 'Remark' THEN {c} END IGNORE NULLS)"
    f" OVER w, 0) AS {c}"
    for c in ["eden_after", "survivor_after", "old_after", "humongous_after"]
)

_ORACLES = {
    "q01_parse_classify": O.with_ctes() + """
SELECT event_class, CAST(COUNT(*) AS BIGINT) AS n
FROM prow GROUP BY event_class
""",
    "q02_pause_end_fields": O.with_ctes() + """
SELECT conv_id, turn_idx, CAST(gc_seq AS INT) AS event_id,
       ptype AS pause_type, reason, offset_ms,
       hb AS heap_before, ha AS heap_after, ht AS heap_total, duration_ms
FROM prow WHERE event_class = 'pause_end'
""",
    "q03_pause_events_sink": O.with_ctes() + """
SELECT p.conv_id, p.turn_idx, CAST(p.gc_seq AS INT) AS event_id,
       p.event_class,
       CASE WHEN p.event_class IN ('pause_start','pause_end')
            THEN p.ptype END AS pause_type,
       CASE WHEN p.event_class IN ('pause_start','pause_end')
            THEN p.reason END AS reason,
       p.offset_ms,
       CASE WHEN p.event_class = 'pause_end' THEN p.hb END AS heap_before,
       CASE WHEN p.event_class = 'pause_end' THEN p.ha END AS heap_after,
       CASE WHEN p.event_class = 'pause_end' THEN p.ht END AS heap_total,
       CASE WHEN p.event_class = 'pause_end' THEN p.duration_ms END
         AS duration_ms,
       CASE WHEN p.event_class = 'nr_regions' THEN p.region END AS region,
       CASE WHEN p.event_class = 'nr_regions' THEN p.region_before END
         AS region_before,
       CASE WHEN p.event_class = 'nr_regions' THEN p.region_after END
         AS region_after,
       r.role_group,
       CAST(NULL AS STRING) AS tool_family,
       p.ts
FROM prow p LEFT JOIN role_dim r ON p.role = r.role
WHERE p.event_class = 'nr_regions'
   OR (p.event_class IN ('pause_start','pause_end') AND p.ptype <> 'Cleanup')
""",
    "q04_tool_calls_sink": O.with_ctes() + """
SELECT p.conv_id, p.turn_idx, p.tool, d.tool_family, d.is_side_effecting, p.ts
FROM prow p JOIN tool_dim d ON p.tool = d.tool
WHERE p.tool IS NOT NULL
""",
    "q05_unmatched_sink": O.with_ctes() + """
SELECT t.conv_id, t.turn_idx, t.text,
       'header_mismatch' AS reason_code, t.ts
FROM transcripts t
JOIN prow p ON t.conv_id = p.conv_id AND t.turn_idx = p.turn_idx
WHERE p.event_class = 'unmatched'
""",
    "q06_assembled_pauses": O.with_ctes() + """
SELECT conv_id, event_id, pause_type, reason, offset_ms, duration_ms,
       heap_before, heap_after, heap_total,
       eden_after, survivor_after, old_after, humongous_after, ts
FROM easm WHERE verdict = 'ok'
""",
    "q07_assembly_errors": O.with_ctes() + """
SELECT conv_id, event_id, verdict AS error_code,
       CASE WHEN verdict = 'end_before_start'
            THEN 'Received PauseEnd before PauseStart. Either a bug or '
                 || 'invalid GC log. EventId: ' || CAST(event_id AS STRING)
            ELSE 'Received PauseEnd without receiving region information. '
                 || 'Either a bug or invalid GC log. '
                 || 'Regions: {Eden,Survivor,Humongous}. EventId: '
                 || CAST(event_id AS STRING)
       END AS error_message,
       ts
FROM easm WHERE verdict <> 'ok'
""",
    "q08_conv_state_final": O.with_ctes() + f"""
SELECT conv_id,
  {_COUNTER_SQL},
  MAX(offset_ms) AS time_offset_ms,
  arg_max(heap_after, offset_ms) AS heap_size,
  arg_max(heap_total, offset_ms) AS heap_total,
  {_GEN_FINAL_SQL}
FROM easm WHERE verdict = 'ok'
GROUP BY conv_id
""",
    "q09_conv_state_scan": O.with_ctes() + f"""
SELECT conv_id, event_id, offset_ms AS time_offset_ms,
  {_COUNTER_WIN_SQL},
  heap_after AS heap_size, heap_total,
  {_GEN_WIN_SQL}
FROM easm WHERE verdict = 'ok'
WINDOW w AS (PARTITION BY conv_id ORDER BY offset_ms, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    "q10_bucket_turn_counts": O.with_ctes() + """
SELECT date_trunc('hour', ts) AS bucket, CAST(COUNT(*) AS BIGINT) AS turn_count
FROM transcripts GROUP BY date_trunc('hour', ts)
""",
    "q11_bucket_pause_stats": O.with_ctes() + """
SELECT date_trunc('hour', ts) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS pause_count,
       ROUND(AVG(duration_ms), 6) AS mean_ms,
       ROUND(CAST(quantile_cont(duration_ms, 0.99) AS DOUBLE), 6) AS p99_ms
FROM easm WHERE verdict = 'ok'
GROUP BY date_trunc('hour', ts)
""",
    "q12_duration_histogram": O.with_ctes() + """
SELECT CAST(FLOOR(duration_ms / 10.0) AS BIGINT) AS dur_bucket,
       CAST(COUNT(*) AS BIGINT) AS pause_count
FROM easm WHERE verdict = 'ok'
GROUP BY CAST(FLOOR(duration_ms / 10.0) AS BIGINT)
""",
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full parse->classify over sf0.001 synthetic transcripts."""
    return q01_parse_classify(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_parse_classify": q01_parse_classify,
        "q02_pause_end_fields": q02_pause_end_fields,
        "q03_pause_events_sink": q03_pause_events_sink,
        "q04_tool_calls_sink": q04_tool_calls_sink,
        "q05_unmatched_sink": q05_unmatched_sink,
        "q06_assembled_pauses": q06_assembled_pauses,
        "q07_assembly_errors": q07_assembly_errors,
        "q08_conv_state_final": q08_conv_state_final,
        "q09_conv_state_scan": q09_conv_state_scan,
        "q10_bucket_turn_counts": q10_bucket_turn_counts,
        "q11_bucket_pause_stats": q11_bucket_pause_stats,
        "q12_duration_histogram": q12_duration_histogram,
    }


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
