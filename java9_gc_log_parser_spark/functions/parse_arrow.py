"""Arrow-batched pandas parse stage — semantics-identical to parse.py.

BASELINE.json's north star names a "vectorized regex/grok parse stage
implemented with pandas/Arrow UDFs". This is that implementation: one
``mapInPandas`` kernel that evaluates the header regex ONCE per line (vs the
built-in cascade's one JVM evaluation per extracted group) and each body
production once per line in the reference alternation order, using pandas
``str.extract``/``str.match`` over the whole Arrow batch.

parse.py (pure JVM built-ins) remains the default: it fuses into whole-stage
codegen and avoids Python workers entirely. This variant exists because (a)
the north star names it, (b) on regex-heavy schemas a single-pass Python
kernel can beat N-pass JVM extraction — bench.py settles which one wins at a
given scale. A parity test asserts row-identical output on the full grammar
corpus and the synthesized transcripts.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from . import grammar as G

if TYPE_CHECKING:
    import pandas as pd

PARSE_FIELDS = [
    T.StructField("event_class", T.StringType()),
    T.StructField("offset_ms", T.LongType()),
    T.StructField("level", T.StringType()),
    T.StructField("tags", T.ArrayType(T.StringType())),
    T.StructField("event_id", T.IntegerType()),
    T.StructField("pause_type", T.StringType()),
    T.StructField("reason", T.StringType()),
    T.StructField("heap_before", T.LongType()),
    T.StructField("heap_after", T.LongType()),
    T.StructField("heap_total", T.LongType()),
    T.StructField("duration_ms", T.DoubleType()),
    T.StructField("region", T.StringType()),
    T.StructField("region_before", T.LongType()),
    T.StructField("region_after", T.LongType()),
    T.StructField("region_size_mb", T.LongType()),
    T.StructField("phase_details", T.StringType()),
    T.StructField("phase_ms", T.DoubleType()),
    T.StructField("reason_code", T.StringType()),
]

_INT32_MAX = 2**31 - 1
_INT64_MAX = 2**63 - 1


def _parse_batch(pdf: "pd.DataFrame", text_col: str) -> "pd.DataFrame":
    import numpy as np
    import pandas as pd

    text = pdf[text_col].astype("string")
    n = len(pdf)

    h = text.str.extract(G.HEADER_RE, expand=True)
    header_ok = h[0].notna()
    body = h[6].fillna("")

    # --- body classification, reference alternation order ---
    def match(pat: str) -> "pd.Series":
        return body.str.match(pat, na=False)

    is_nr = match(G.NR_REGIONS_RE)
    is_end = match(G.PAUSE_END_RE)
    is_start = match(G.PAUSE_START_RE)
    masks = [
        is_nr,
        is_end & ~is_nr,
        is_start & ~is_end & ~is_nr,
        match(G.CONCURRENT_CYCLE_RE),
        match(G.TO_SPACE_RE),
        match(G.USING_G1_RE),
        match(G.REGION_SIZE_RE),
        match(G.PHASE_RE),
    ]
    classes = [c for c, _ in G.BODY_CASCADE]
    grammar_class = pd.Series(np.select(
        [(~header_ok).to_numpy(dtype=bool)]
        + [m.to_numpy(dtype=bool) for m in masks],
        ["unmatched"] + classes,
        default="unmatched",
    ), index=pdf.index)

    end_x = body.str.extract(G.PAUSE_END_RE, expand=True)
    start_x = body.str.extract(G.PAUSE_START_RE, expand=True)
    nr_x = body.str.extract(G.NR_REGIONS_RE, expand=True)
    rs_x = body.str.extract(G.REGION_SIZE_RE, expand=True)
    ph_x = body.str.extract(G.PHASE_RE, expand=True)

    listed = set(G.REASONS)

    def reason_inner(raw: "pd.Series") -> "pd.Series":
        return raw.str.slice(1, -1)

    def unlisted(raw: "pd.Series") -> "pd.Series":
        return raw.notna() & ~reason_inner(raw).isin(listed)

    end_unl = is_end & unlisted(end_x[1])
    start_unl = (~is_end) & is_start & unlisted(start_x[1])
    any_unl = (end_unl | start_unl) & header_ok

    # numeric overflow demotion (parse.py parity)
    def ovf(s: "pd.Series", maxv: int) -> "pd.Series":
        num = pd.to_numeric(s, errors="coerce")
        return s.notna() & ((num > maxv) | num.isna())

    overflow = ovf(h[5], _INT32_MAX) | ovf(h[0], _INT64_MAX)
    overflow |= (grammar_class == "pause_end") & (
        ovf(end_x[2], _INT64_MAX) | ovf(end_x[3], _INT64_MAX) | ovf(end_x[4], _INT64_MAX)
    )
    overflow |= (grammar_class == "nr_regions") & (
        ovf(nr_x[1], _INT64_MAX) | ovf(nr_x[2], _INT64_MAX)
    )
    overflow |= (grammar_class == "region_size") & ovf(rs_x[0], _INT64_MAX)

    event_class = grammar_class.where(~any_unl, "unmatched").where(
        ~((grammar_class != "unmatched") & overflow), "unmatched"
    )
    matched = event_class != "unmatched"

    reason_code = pd.Series(np.select(
        [
            (~header_ok).to_numpy(dtype=bool),
            any_unl.to_numpy(dtype=bool),
            ((grammar_class != "unmatched") & overflow).to_numpy(dtype=bool),
            (event_class == "unmatched").to_numpy(dtype=bool),
        ],
        ["header_mismatch", "unlisted_reason", "numeric_overflow", "body_mismatch"],
        default=None,
    ), index=pdf.index, dtype="object").where(~matched, None)

    # offset: Duration.toMillis truncation (parse.py parity)
    h_int = pd.to_numeric(h[0], errors="coerce")
    frac3 = h[1].fillna("0").str.slice(0, 3).str.pad(3, "right", "0")
    off_s = h_int * 1000 + pd.to_numeric(frac3, errors="coerce")
    offset_ms = off_s.where(h[2] == "s", h_int).where(matched)

    def tags_list(s):
        if s is None or s is pd.NA:
            return None
        return sorted(set(t for t in re.split(r"\s*,\s*", s.strip()) if t))

    tags = h[4].map(tags_list).where(matched, None)
    event_id = pd.to_numeric(h[5], errors="coerce").where(matched)

    is_ec_end = event_class == "pause_end"
    is_ec_start = event_class == "pause_start"
    ptype_map = G.PAUSE_TYPES
    pause_type = (
        end_x[0].map(ptype_map).where(is_ec_end)
        .combine_first(start_x[0].map(ptype_map).where(is_ec_start))
        .where(is_ec_end | is_ec_start)
    )
    reason = (
        reason_inner(end_x[1]).map(G.REASONS).where(is_ec_end)
        .combine_first(reason_inner(start_x[1]).map(G.REASONS).where(is_ec_start))
        .where(is_ec_end | is_ec_start)
    )

    def dur_ms(i, f, unit):
        v = pd.to_numeric(i + "." + f.fillna("0"), errors="coerce")
        return v.where(unit != "s", v * 1000.0)

    out = pd.DataFrame(index=pdf.index)
    for c in pdf.columns:
        out[c] = pdf[c]
    out["event_class"] = event_class.astype("object")
    out["offset_ms"] = offset_ms.astype("Int64")
    out["level"] = h[3].where(matched, None).astype("object")
    out["tags"] = tags
    out["event_id"] = event_id.astype("Int32")
    out["pause_type"] = pause_type.astype("object")
    out["reason"] = reason.astype("object")
    out["heap_before"] = pd.to_numeric(end_x[2], errors="coerce").where(is_ec_end).astype("Int64")
    out["heap_after"] = pd.to_numeric(end_x[3], errors="coerce").where(is_ec_end).astype("Int64")
    out["heap_total"] = pd.to_numeric(end_x[4], errors="coerce").where(is_ec_end).astype("Int64")
    out["duration_ms"] = dur_ms(end_x[5], end_x[6], end_x[7]).where(is_ec_end).astype("Float64")
    is_ec_nr = event_class == "nr_regions"
    out["region"] = nr_x[0].where(is_ec_nr).astype("object")
    out["region_before"] = pd.to_numeric(nr_x[1], errors="coerce").where(is_ec_nr).astype("Int64")
    out["region_after"] = pd.to_numeric(nr_x[2], errors="coerce").where(is_ec_nr).astype("Int64")
    out["region_size_mb"] = (
        pd.to_numeric(rs_x[0], errors="coerce").where(event_class == "region_size").astype("Int64")
    )
    is_ec_ph = event_class == "phase"
    out["phase_details"] = ph_x[0].where(is_ec_ph).astype("object")
    out["phase_ms"] = dur_ms(ph_x[1], ph_x[2], ph_x[3]).where(is_ec_ph).astype("Float64")
    out["reason_code"] = reason_code.astype("object")
    return out


def parse_lines_arrow(df: DataFrame, text_col: str = "text") -> DataFrame:
    """mapInPandas twin of parse.parse_lines (same output schema)."""
    schema = T.StructType(list(df.schema.fields) + PARSE_FIELDS)

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield _parse_batch(pdf, text_col)

    return df.mapInPandas(fn, schema)
