"""Broadcast-join enrichment against role/tool lookup dims (SURVEY §2.6).

Target-only operator (the reference joins nothing). Dims are tiny closed
vocabularies -> always broadcast; never let a 4-row dim trigger a shuffle of
the 10^12-row fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.dims import role_dim, tool_dim


def enrich(df: DataFrame, with_role: bool = True, with_tool: bool = True) -> DataFrame:
    """Left-join role_dim/tool_dim with explicit broadcast hints."""
    spark = df.sparkSession
    out = df
    if with_role and "role" in df.columns:
        out = out.join(F.broadcast(role_dim(spark)), "role", "left")
    if with_tool and "tool" in df.columns:
        out = out.join(F.broadcast(tool_dim(spark)), "tool", "left")
    return out
