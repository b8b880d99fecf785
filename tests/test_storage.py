"""Storage-seam tests: format dispatch, schema discipline for text formats,
and JSONL/CSV round-trip fidelity (incl. timestamp micros)."""

from __future__ import annotations

import datetime

import pytest

from java9_gc_log_parser_spark.storage import (
    TableRef,
    read_table,
    write_table,
)

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

ROWS = [
    ("c1", 0, "user", "[1.001s][info][gc] GC(3) text", None,
     datetime.datetime(2024, 1, 1, 0, 0, 1, 778549)),
    ("c1", 1, "assistant", "plain text", "bash",
     datetime.datetime(2024, 1, 1, 0, 2, 3, 5)),
]


@pytest.mark.parametrize("fmt", ["jsonl", "csv"])
def test_text_format_roundtrip(spark, tmp_path, fmt):
    df = spark.createDataFrame(ROWS, SCHEMA)
    ref = TableRef(str(tmp_path / f"t_{fmt}"), format=fmt, schema=SCHEMA)
    write_table(df, ref)
    back = read_table(spark, ref)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_text_format_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="schema"):
        read_table(spark, TableRef(str(tmp_path / "x"), format="jsonl"))
