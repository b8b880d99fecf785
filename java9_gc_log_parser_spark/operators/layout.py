"""Write-side layout control: deterministic range clustering + zone-map
audit — the file-layout lever that makes every LATER scan cheap.

At 100 TB the dominant cost of most queries is the scan, and the scan's
cost is decided at WRITE time: if files are range-clustered on the common
predicate column (almost always event time), parquet row-group min/max
stats ("zone maps") let readers skip all but the matching files —
`WHERE ts BETWEEN x AND y` touches 1/n of the data instead of all of it.

Spark's own `repartitionByRange` samples the data to pick boundaries, so
two runs (or two engines) produce different layouts. Here the boundaries
are EXACT percentiles of the cluster key, which makes the layout a pure
function of the data: reproducible across runs, engines, and re-ingestions,
and replayable row-for-row by the DuckDB oracle (quantile_cont — the
established q73 exact-percentile pair).

Scale notes (100 TB):
  * boundary computation is ONE holistic percentile agg producing
    n_clusters-1 numbers — at extreme row counts switch to
    approx_percentile or the q65 mergeable histogram sketch (documented
    error bound); the assignment side is unchanged either way.
  * assignment is map-only: broadcast the boundary array, cluster =
    #{b in boundaries : v > b} via a codegen'd array filter — no shuffle
    beyond the final clustered write's repartition(cluster).
  * the write shuffles each row ONCE on its cluster id and sorts within
    partitions on the key, so row groups inside every file are also
    key-ordered — min/max stats stay tight at file AND row-group grain.
  * the zone-map audit (per-cluster min/max/count + pairwise disjointness)
    is a tiny n_clusters-row agg over the written table — the invariant
    that makes skipping sound is ASSERTED, not assumed.

Reference parity: beyond-reference operator (SURVEY §2 extension set); the
reference streams one log file — a corpus store must decide physical
layout, and time-clustering is the canonical choice for event data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["range_boundaries", "range_cluster", "zone_map"]


def range_boundaries(df: DataFrame, col: str, n_clusters: int) -> DataFrame:
    """One row ``(_bs: array<double>)`` — the n_clusters-1 exact
    interpolated percentile boundaries of ``col`` at i/n_clusters."""
    if n_clusters < 2:
        raise ValueError(f"n_clusters must be >= 2, got {n_clusters}")
    qs = [i / n_clusters for i in range(1, n_clusters)]
    return df.agg(
        F.percentile(F.col(col).cast("double"), F.array(*[F.lit(q) for q in qs])).alias(
            "_bs"
        )
    )


def range_cluster(df: DataFrame, col: str, n_clusters: int = 8) -> DataFrame:
    """Append a deterministic ``cluster`` id: #{boundary < value}.

    A value exactly ON a boundary goes to the LOWER cluster (strict >);
    boundary/data ties only occur where the percentile lands on an exact
    rank, where interpolation is exact in both engines (the q73 argument),
    so the assignment is engine-stable.
    """
    bs = range_boundaries(df, col, n_clusters)
    v = F.col(col).cast("double")
    return (
        df.crossJoin(F.broadcast(bs))
        .withColumn(
            "cluster",
            F.size(F.filter(F.col("_bs"), lambda b: v > b)).cast("int"),
        )
        .drop("_bs")
    )


def zone_map(clustered: DataFrame, col: str) -> DataFrame:
    """Per-cluster zone-map stats + the disjointness proof.

    Output (n_clusters rows): ``(cluster, n_rows, min_v, max_v, disjoint)``
    where disjoint asserts this cluster's min exceeds the previous
    cluster's max — the invariant that makes min/max file skipping sound.
    min/max are the raw key values cast to long (the key is integral here:
    epoch micros).
    """
    stats = clustered.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min(F.col(col).cast("long")).alias("min_v"),
        F.max(F.col(col).cast("long")).alias("max_v"),
    )
    w = Window.orderBy("cluster")
    return stats.select(
        "cluster",
        "n_rows",
        "min_v",
        "max_v",
        F.coalesce(
            F.col("min_v") > F.lag("max_v").over(w), F.lit(True)
        ).alias("disjoint"),
    )
