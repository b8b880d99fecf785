"""DuckDB oracle CTE builders.

The driver cross-checks each ``__spark_entry__.queries()`` entry against
``oracle_sql()`` in DuckDB over the same parquet tables. Because transcripts
are synthesized from ``events`` via shared SQL (sources/transcripts.py), the
oracle can *re-derive the expected output of every pipeline stage directly
from the generative parameters* — no regex, fully independent of the Spark
parse implementation. A Spark/oracle match therefore validates grammar
classification, field extraction, routing, assembly and aggregation end to
end.

All SQL here is DuckDB-dialect-compatible ANSI that also matches the Spark
semantics being checked (same arithmetic, same string construction).
"""

from __future__ import annotations

from .sources.dims import duckdb_role_dim_cte, duckdb_tool_dim_cte
from .sources.transcripts import transcripts_sql

# expected per-row parse outcome, derived from generative parameters only
PROW_CTE = """
prow AS (
  SELECT *,
    CAST(ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY eid) - 1 AS INT)
      AS turn_idx,
    CASE
      WHEN slot = 0 THEN
        CASE WHEN drop_start THEN 'unmatched' ELSE 'pause_start' END
      WHEN slot >= 1 AND slot <= 4 THEN
        CASE WHEN NOT has_regions THEN 'unmatched'
             WHEN slot = 3 AND drop_old THEN 'unmatched'
             ELSE 'nr_regions' END
      WHEN slot = 5 THEN 'pause_end'
      ELSE 'unmatched' END AS event_class,
    off_s * 1000 + CAST(off_f AS BIGINT) AS offset_ms,
    CAST(CAST(dur_i AS STRING) || '.' || dur_f AS DOUBLE) AS duration_ms,
    CASE slot WHEN 1 THEN 'Eden' WHEN 2 THEN 'Survivor'
              WHEN 3 THEN 'Old' WHEN 4 THEN 'Humongous' END AS region,
    (gc_seq * (slot + 2)) % 60 AS region_before,
    (gc_seq + slot) % 40 AS region_after
  FROM (
    SELECT *,
      CASE ptype_idx WHEN 0 THEN 'Young' WHEN 1 THEN 'Mixed'
                     WHEN 2 THEN 'Full' WHEN 3 THEN 'InitialMark'
                     WHEN 4 THEN 'Remark' ELSE 'Cleanup' END AS ptype,
      CASE ptype_idx WHEN 0 THEN 'Evacuation' WHEN 1 THEN 'Evacuation'
                     WHEN 2 THEN 'AllocationFailure'
                     WHEN 3 THEN 'HumongousAllocation' END AS reason,
      (gc_seq % 17 = 0 AND ptype_idx < 4) AS drop_start,
      (gc_seq % 19 = 0 AND ptype_idx < 4) AS drop_old,
      ptype_idx < 4 AS has_regions,
      (gc_seq * 13) % 900 + 100 AS hb,
      (gc_seq * 7) % 500 + 50 AS ha,
      CAST(1024 AS BIGINT) AS ht,
      (gc_seq * 11) % 90 + 1 AS dur_i,
      lpad(CAST(gc_seq % 1000 AS STRING), 3, '0') AS dur_f,
      gc_seq * 7 + slot AS off_s,
      lpad(CAST(eid % 1000 AS STRING), 3, '0') AS off_f,
      CASE WHEN gc_seq % 10 < 3 THEN 'conv-hot'
           ELSE 'conv-' || CAST(gc_seq % 50 AS STRING) END AS conv_id,
      CASE WHEN slot = 6 THEN 'tool' WHEN slot = 7 THEN 'system'
           WHEN eid % 2 = 0 THEN 'assistant' ELSE 'user' END AS role,
      CASE WHEN slot = 6 THEN
        CASE CAST(eid % 4 AS INT) WHEN 0 THEN 'bash' WHEN 1 THEN 'search'
                                  WHEN 2 THEN 'python' ELSE 'browser' END
      END AS tool
    FROM (
      SELECT event_id AS eid,
             CAST(FLOOR(event_id / 8) AS BIGINT) AS gc_seq,
             CAST(event_id % 8 AS INT) AS slot,
             CAST(CAST(FLOOR(event_id / 8) AS BIGINT) % 6 AS INT) AS ptype_idx,
             ts
      FROM events
    )
  )
)
"""

# expected assembled events + verdicts (slot-5 row carries all group fields;
# Cleanup groups vanish entirely: their start/end are dropped pre-assembly)
EASM_CTE = """
easm AS (
  SELECT conv_id, CAST(gc_seq AS INT) AS event_id, ptype AS pause_type,
         reason, offset_ms, duration_ms,
         hb AS heap_before, ha AS heap_after, ht AS heap_total,
         CASE WHEN ptype = 'Remark' THEN NULL
              ELSE (gc_seq + 1) % 40 END AS eden_after,
         CASE WHEN ptype = 'Remark' THEN NULL
              ELSE (gc_seq + 2) % 40 END AS survivor_after,
         CASE WHEN ptype = 'Remark' THEN NULL
              ELSE (gc_seq + 3) % 40 END AS old_after,
         CASE WHEN ptype = 'Remark' THEN NULL
              ELSE (gc_seq + 4) % 40 END AS humongous_after,
         ts,
         CASE WHEN drop_start THEN 'end_before_start'
              WHEN drop_old AND ptype <> 'Remark' THEN 'missing_regions'
              ELSE 'ok' END AS verdict
  FROM prow
  WHERE slot = 5 AND ptype <> 'Cleanup'
)
"""


def with_ctes(*extra: str) -> str:
    """Compose the WITH clause: transcripts + prow + easm + dims + extras."""
    parts = [
        f"transcripts AS ({transcripts_sql('events')})",
        PROW_CTE.strip().rstrip(),
        EASM_CTE.strip().rstrip(),
        duckdb_role_dim_cte(),
        duckdb_tool_dim_cte(),
        *extra,
    ]
    # strip the leading "xxx AS (" wrapper names are already included
    return "WITH " + ",\n".join(p.strip() for p in parts)
