"""Corpus/key profiling operators: the diagnostics a 100-TB pipeline runs
BEFORE committing to a partitioning or filtering strategy.

Two operators:

  * :func:`key_skew_report` — hot-key diagnostics for any prospective
    shuffle key. The reference never needed this (one JVM log = one key);
    a transcript store does: a runaway agent conversation ("conv-hot" in
    the synth data) can own a double-digit share of all turns, and every
    groupBy/join keyed on conv_id inherits that skew. This report is what
    justifies the salted two-phase aggregation (operators/aggregate.py G2)
    and AQE skew-join settings — measured, not guessed.
  * :func:`length_outlier_gate` — per-source dynamic length filtering:
    instead of one global min/max token gate (wrong for code vs chat vs web
    prose), compute per-source percentile thresholds and gate against them.

Scale notes (100 TB):
  * key_skew_report is a map-combinable count + top-k
    (TakeOrderedAndProject): partial aggregation absorbs the skew it is
    measuring — the hot key's billions of rows pre-combine to one partial
    per map task, so the report itself never suffers the skew it reports.
  * length_outlier_gate uses EXACT per-group percentiles (holistic: buffers
    the group's values) so the DuckDB oracle can replay it bit-for-bit;
    sources are few, but at extreme per-source cardinality switch to
    approx_percentile (documented error) or the q65 mergeable histogram
    sketch — the gate's join side stays a handful of rows either way and
    broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text_analysis import tokens_col

__all__ = ["key_skew_report", "length_outlier_gate"]


def key_skew_report(df: DataFrame, key: str, top_k: int = 10) -> DataFrame:
    """Top-``top_k`` hottest values of ``key`` with share and hot-factor.

    Output: ``(rank, <key>, n_rows, share, hot_factor)`` where share is the
    value's fraction of all rows and hot_factor is its count relative to a
    perfectly uniform key (count * n_distinct / n_total — 1.0 means no
    skew). Deterministic: ties rank by key value ascending.
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").cast("double").alias("_total"),
        F.count(F.lit(1)).cast("double").alias("_k"),
    )
    top = counts.orderBy(F.col("n_rows").desc(), F.col(key).asc()).limit(top_k)
    # rank within the already-limited top-k: a single tiny partition
    w = F.row_number().over(
        Window.orderBy(F.col("n_rows").desc(), F.col(key).asc())
    )
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            w.alias("rank"),
            F.col(key),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
            F.round(F.col("n_rows") * F.col("_k") / F.col("_total"), 6).alias(
                "hot_factor"
            ),
        )
    )


def length_outlier_gate(
    docs: DataFrame,
    group_col: str = "source",
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> DataFrame:
    """Per-group dynamic length gate: keep docs whose token count lies
    within the group's [lo_q, hi_q] exact percentile band.

    Output, one row per doc:
    ``(doc_id, <group_col>, n_tokens, lo, hi, keep)`` — lo/hi are the
    group's interpolated percentile thresholds (6 dp), keep compares the
    integer token count against the UNROUNDED thresholds (an integer can
    only tie a threshold when the percentile lands exactly on a rank, where
    interpolation is exact in both engines, so the comparison is
    engine-stable).
    """
    with_n = docs.select(
        "doc_id",
        F.col(group_col),
        F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
    )
    bands = with_n.groupBy(group_col).agg(
        F.percentile("n_tokens", F.lit(lo_q)).alias("_lo"),
        F.percentile("n_tokens", F.lit(hi_q)).alias("_hi"),
    )
    return with_n.join(F.broadcast(bands), group_col).select(
        "doc_id",
        group_col,
        "n_tokens",
        F.round("_lo", 6).alias("lo"),
        F.round("_hi", 6).alias("hi"),
        (
            (F.col("n_tokens") >= F.col("_lo"))
            & (F.col("n_tokens") <= F.col("_hi"))
        ).alias("keep"),
    )
