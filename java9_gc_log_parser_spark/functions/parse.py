"""Vectorized parse stage: raw `text` column -> typed wide parse columns.

This is the Spark-first re-expression of the reference's per-line combinator
parse (``GcLineParser.scala:112-120`` applied at ``GcLogStream.scala:55``).
Instead of a row-at-a-time PEG, the whole grammar becomes a *columnar
expression cascade* of built-in ``regexp_extract`` / ``rlike`` calls — pure
JVM, whole-stage-codegen-fused, no Python in the hot path. An Arrow/pandas-UDF
variant with identical semantics lives in ``parse_arrow.py`` (parity-tested).

Output schema (all nullable; null means "not applicable to this class"):

  event_class   string  -- one of grammar.EVENT_CLASSES
  offset_ms     bigint  -- header time, whole ms (Duration.toMillis truncation)
  level         string  -- info|warn
  tags          array<string> (distinct, sorted)
  event_id      int     -- the GC(n) correlation key, null when absent
  pause_type    string  -- Young|InitialMark|Remark|Mixed|Cleanup|Full
  reason        string  -- Evacuation|HumongousAllocation|AllocationFailure
  heap_before / heap_after / heap_total   bigint (MB)
  duration_ms   double
  region        string  -- Eden|Survivor|Old|Humongous
  region_before / region_after            bigint
  region_size_mb bigint
  phase_details string
  phase_ms      double
  reason_code   string  -- only for event_class='unmatched':
                           header_mismatch | body_mismatch | unlisted_reason

Unmatched lines keep every parse field null and preserve the raw text
(reference ``UnknownLine``, ``GcLineParser.scala:116-118``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import grammar as G

_H = G.HEADER_RE


def _hdr(text: Column, idx: int) -> Column:
    return F.regexp_extract(text, _H, idx)


def _dur_ms(i: Column, f: Column, unit: Column) -> Column:
    """offset production -> fractional milliseconds (GcLineParser.scala:28-33)."""
    num = F.concat(i, F.lit("."), F.when(f == "", "0").otherwise(f)).try_cast("double")
    return F.when(unit == "s", num * 1000.0).otherwise(num)


def parse_lines(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the wide parse-struct columns to ``df``.

    One Project node; Catalyst fuses the whole cascade into a single
    whole-stage-codegen span over the scan.
    """
    text = F.col(text_col)
    header_ok = text.rlike(_H)

    h_int, h_frac, h_unit = _hdr(text, 1), _hdr(text, 2), _hdr(text, 3)
    level = _hdr(text, 4)
    tags_raw = _hdr(text, 5)
    event_id_raw = _hdr(text, 6)
    event_id = F.when(event_id_raw != "", event_id_raw.try_cast("int"))
    body = _hdr(text, 7)

    # Duration.toMillis truncates sub-ms; for unit 's' that is
    # int_part*1000 + first-three fraction digits (zero-padded).
    frac3 = F.rpad(F.substring(F.when(h_frac == "", "0").otherwise(h_frac), 1, 3), 3, "0")
    offset_ms = F.when(
        h_unit == "s", h_int.try_cast("long") * 1000 + frac3.cast("long")
    ).otherwise(h_int.try_cast("long"))

    tags = F.array_sort(
        F.array_distinct(
            F.filter(
                F.split(F.regexp_replace(tags_raw, r"\s+", ""), ","),
                lambda x: x != "",
            )
        )
    )

    # --- body productions, reference alternation order ---
    is_nr = body.rlike(G.NR_REGIONS_RE)
    is_end = body.rlike(G.PAUSE_END_RE)
    is_start = body.rlike(G.PAUSE_START_RE)
    is_cc = body.rlike(G.CONCURRENT_CYCLE_RE)
    is_ts = body.rlike(G.TO_SPACE_RE)
    is_g1 = body.rlike(G.USING_G1_RE)
    is_rs = body.rlike(G.REGION_SIZE_RE)
    is_ph = body.rlike(G.PHASE_RE)

    # reason: captured *with* parens so "absent" ('') differs from "()" — the
    # reference throws a MatchError on any parsed-but-unlisted reason string
    # (GcLineParser.scala:57-61); we dead-letter those lines instead.
    end_reason_raw = F.regexp_extract(body, G.PAUSE_END_RE, 2)
    start_reason_raw = F.regexp_extract(body, G.PAUSE_START_RE, 2)

    def inner(raw: Column) -> Column:
        return F.substring(raw, 2, F.length(raw) - 2)

    listed = list(G.REASONS.keys())

    def reason_mapped(raw: Column) -> Column:
        i = inner(raw)
        c = F.when(raw == "", F.lit(None).cast("string"))
        for lit in listed:
            c = c.when(i == lit, G.REASONS[lit])
        return c.otherwise(F.lit(None).cast("string"))

    def reason_unlisted(raw: Column) -> Column:
        return (raw != "") & ~inner(raw).isin(listed)

    ptype_map = F.create_map(
        *[F.lit(x) for kv in G.PAUSE_TYPES.items() for x in kv]
    )

    end_unlisted = is_end & reason_unlisted(end_reason_raw)
    start_unlisted = (~is_end) & is_start & reason_unlisted(start_reason_raw)

    grammar_class = (
        F.when(~header_ok, "unmatched")
        .when(is_nr, "nr_regions")
        .when(end_unlisted | start_unlisted, "unmatched")
        .when(is_end, "pause_end")
        .when(is_start, "pause_start")
        .when(is_cc, "concurrent_cycle")
        .when(is_ts, "to_space_exhausted")
        .when(is_g1, "using_g1")
        .when(is_rs, "region_size")
        .when(is_ph, "phase")
        .otherwise("unmatched")
    )

    # Numeric-overflow demotion: a line whose digits exceed the target type
    # would throw in the reference (String.toLong / toInt) and fail-stop the
    # stream; here it becomes a dead-letter row instead of failing the job.
    def _ovf(raw: Column, typ: str) -> Column:
        return (raw != "") & raw.try_cast(typ).isNull()

    overflow = (
        _ovf(event_id_raw, "int")
        | _ovf(h_int, "long")
        | F.when(
            grammar_class == "pause_end",
            _ovf(F.regexp_extract(body, G.PAUSE_END_RE, 3), "long")
            | _ovf(F.regexp_extract(body, G.PAUSE_END_RE, 4), "long")
            | _ovf(F.regexp_extract(body, G.PAUSE_END_RE, 5), "long"),
        ).otherwise(F.lit(False))
        | F.when(
            grammar_class == "nr_regions",
            _ovf(F.regexp_extract(body, G.NR_REGIONS_RE, 2), "long")
            | _ovf(F.regexp_extract(body, G.NR_REGIONS_RE, 3), "long"),
        ).otherwise(F.lit(False))
        | F.when(
            grammar_class == "region_size",
            _ovf(F.regexp_extract(body, G.REGION_SIZE_RE, 1), "long"),
        ).otherwise(F.lit(False))
    )

    event_class = F.when(
        (grammar_class != "unmatched") & overflow, "unmatched"
    ).otherwise(grammar_class)

    reason_code = (
        F.when(~header_ok, "header_mismatch")
        .when(end_unlisted | start_unlisted, "unlisted_reason")
        .when((grammar_class != "unmatched") & overflow, "numeric_overflow")
        .otherwise("body_mismatch")
    )

    matched = event_class != "unmatched"

    pause_type = F.when(
        event_class == "pause_end",
        ptype_map[F.regexp_extract(body, G.PAUSE_END_RE, 1)],
    ).when(
        event_class == "pause_start",
        ptype_map[F.regexp_extract(body, G.PAUSE_START_RE, 1)],
    )

    reason = F.when(event_class == "pause_end", reason_mapped(end_reason_raw)).when(
        event_class == "pause_start", reason_mapped(start_reason_raw)
    )

    def endg(i: int) -> Column:
        return F.regexp_extract(body, G.PAUSE_END_RE, i)

    heap_before = F.when(event_class == "pause_end", endg(3).try_cast("long"))
    heap_after = F.when(event_class == "pause_end", endg(4).try_cast("long"))
    heap_total = F.when(event_class == "pause_end", endg(5).try_cast("long"))
    duration_ms = F.when(
        event_class == "pause_end", _dur_ms(endg(6), endg(7), endg(8))
    )

    region = F.when(event_class == "nr_regions", F.regexp_extract(body, G.NR_REGIONS_RE, 1))
    region_before = F.when(
        event_class == "nr_regions", F.regexp_extract(body, G.NR_REGIONS_RE, 2).try_cast("long")
    )
    region_after = F.when(
        event_class == "nr_regions", F.regexp_extract(body, G.NR_REGIONS_RE, 3).try_cast("long")
    )

    region_size_mb = F.when(
        event_class == "region_size", F.regexp_extract(body, G.REGION_SIZE_RE, 1).try_cast("long")
    )

    phase_details = F.when(event_class == "phase", F.regexp_extract(body, G.PHASE_RE, 1))
    phase_ms = F.when(
        event_class == "phase",
        _dur_ms(
            F.regexp_extract(body, G.PHASE_RE, 2),
            F.regexp_extract(body, G.PHASE_RE, 3),
            F.regexp_extract(body, G.PHASE_RE, 4),
        ),
    )

    return df.withColumns(
        {
            "event_class": event_class,
            "offset_ms": F.when(matched, offset_ms),
            "level": F.when(matched, level),
            "tags": F.when(matched, tags),
            "event_id": F.when(matched, event_id),
            "pause_type": pause_type,
            "reason": reason,
            "heap_before": heap_before,
            "heap_after": heap_after,
            "heap_total": heap_total,
            "duration_ms": duration_ms,
            "region": region,
            "region_before": region_before,
            "region_after": region_after,
            "region_size_mb": region_size_mb,
            "phase_details": phase_details,
            "phase_ms": phase_ms,
            "reason_code": F.when(event_class == "unmatched", reason_code),
        }
    )


PARSE_COLUMNS = [
    "event_class",
    "offset_ms",
    "level",
    "tags",
    "event_id",
    "pause_type",
    "reason",
    "heap_before",
    "heap_after",
    "heap_total",
    "duration_ms",
    "region",
    "region_before",
    "region_after",
    "region_size_mb",
    "phase_details",
    "phase_ms",
    "reason_code",
]
