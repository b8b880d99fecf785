"""Hypertable-style time-series rollup: bucketed gap-fill + LOCF/interp.

Reference parity note: beyond-reference operator (SURVEY §2 extension set).
The reference's closest shape is its per-bucket rollups (counts / pause
stats over coarse time buckets); this adds the TimescaleDB-style
``time_bucket_gapfill + locf + interpolate`` continuous-rollup surface a
monitoring consumer of the reference's SSE feed would build next: a dense,
regular time grid per key even where the raw stream has holes.

Scale shape (100 TB):

* Stage 1 is a plain ``groupBy(key, bucket)`` — map-side partial
  aggregation compresses the raw stream to one row per (key, bucket)
  BEFORE the shuffle, so the exchange moves rollups, not events.
* Stage 2 is one window pass per key over the rolled-up rows (ordered by
  bucket, ``lead`` only — O(1) state per row, a single sort of the already
  tiny per-key series). This is a second, much smaller exchange: shuffling
  raw events once on ``key`` alone to save it would move orders of
  magnitude more bytes than the rollup exchange costs.
* Densification happens INSIDE the row stream (``sequence`` + ``explode``
  of each gap run) — the dense grid is never materialized as a join side,
  so there is no grid×fact join and no third shuffle. ``max_fill`` bounds
  the blow-up per gap (a key that goes dark for a month must not emit an
  unbounded run of synthetic rows); beyond it the gap is left open and the
  row is flagged via ``gap_truncated``.

Float contract (cross-engine oracle parity): per-bucket means are derived
from an ORDER-INDEPENDENT exact-integer sum (``SUM(FLOOR(value*1000))`` as
BIGINT) divided in a fixed operation order, so Spark and DuckDB produce
bit-identical doubles; the interpolation arithmetic uses the same explicit
op tree on both engines and rounds to 6 dp only at the output boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_locf(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    bucket_us: int = 21_600_000_000,
    max_fill: int = 8,
) -> DataFrame:
    """Bucketed rollup of ``value`` per (key, time bucket), densified with
    up to ``max_fill`` synthetic rows per gap, each carrying the
    last-observation value (``v_locf``) and the linear interpolation toward
    the next observation (``v_interp``).

    Output: key, ``bucket_ts`` (bucket start), ``filled`` (synthetic row?),
    ``gap_truncated`` (gap wider than max_fill — grid intentionally left
    open), ``n_obs`` (0 on filled rows), ``v_locf``, ``v_interp``.
    """
    if bucket_us < 1:
        raise ValueError(f"bucket_us must be >= 1, got {bucket_us}")
    if max_fill < 0:
        raise ValueError(f"max_fill must be >= 0, got {max_fill}")

    # parquet timestamps arrive as TIMESTAMP_NTZ; unix_micros needs
    # TIMESTAMP (session tz is pinned UTC, so the cast is micro-identity)
    bucket = (
        F.unix_micros(F.col(ts).cast("timestamp")) / F.lit(bucket_us)
    ).cast("long")
    rolled = (
        events.filter(F.col(value).isNotNull())
        .groupBy(F.col(key), bucket.alias("_gf_b"))
        .agg(
            F.count(F.lit(1)).alias("_gf_n"),
            F.sum(F.floor(F.col(value) * 1000).cast("long")).alias("_gf_vmil"),
        )
        .withColumn(
            "_gf_v",
            F.col("_gf_vmil").cast("double") / F.lit(1000.0)
            / F.col("_gf_n").cast("double"),
        )
    )
    w = Window.partitionBy(key).orderBy("_gf_b")
    run = rolled.select(
        key,
        "_gf_b",
        "_gf_n",
        "_gf_v",
        F.lead("_gf_b").over(w).alias("_gf_nb"),
        F.lead("_gf_v").over(w).alias("_gf_nv"),
    )
    gap = F.col("_gf_nb") - F.col("_gf_b")
    n_fill = F.when(
        F.col("_gf_nb").isNull(), F.lit(0).cast("long")
    ).otherwise(F.least(gap - 1, F.lit(max_fill).cast("long")))
    step = F.col("_gf_step")
    interp = F.when(F.col("_gf_nb").isNull(), F.col("_gf_v")).otherwise(
        F.col("_gf_v")
        + ((F.col("_gf_nv") - F.col("_gf_v")) * step.cast("double"))
        / gap.cast("double")
    )
    return (
        run.withColumn(
            "_gf_step", F.explode(F.sequence(F.lit(0).cast("long"), n_fill))
        )
        .select(
            key,
            F.timestamp_micros((F.col("_gf_b") + step) * F.lit(bucket_us))
            .cast("timestamp_ntz")
            .alias("bucket_ts"),
            (step > 0).alias("filled"),
            (
                F.col("_gf_nb").isNotNull() & (gap - 1 > F.lit(max_fill))
            ).alias("gap_truncated"),
            F.when(step == 0, F.col("_gf_n"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("n_obs"),
            F.round(F.col("_gf_v"), 6).alias("v_locf"),
            F.round(interp, 6).alias("v_interp"),
        )
    )
