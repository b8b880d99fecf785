"""Skew-join evidence: manual salted_join vs AQE skew-split (r3 task #6).

Builds a deliberately skewed fact table (one conv_id owning ``HOT_FRAC`` of
all rows) and a dim too large to broadcast (broadcast disabled explicitly,
as it would be for a multi-GB dim at 100 TB), then measures the same inner
equi-join three ways:

  1. ``plain``      — shuffle join, AQE skew-split OFF
  2. ``aqe_skew``   — shuffle join, AQE skew-split ON (thresholds lowered so
                      the optimization actually fires at bench scale; at
                      production scale the defaults fire on real skew)
  3. ``salted``     — operators.enrich.salted_join (deterministic salt,
                      dim replicated n_salts times)

For each leg we record wall seconds and the per-task row spread of the join
stage (rows grouped by ``spark_partition_id()`` straight after the join,
before any later exchange): ``max/median`` rows per task is the skew
number — 1.0 is perfectly even, big numbers mean one straggler task owns
the hot key.

Prints ONE JSON line; the recorded run is summarized in BASELINE.md and the
when-to-use-which guidance lives in ``salted_join``'s docstring.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

N_FACT = int(os.environ.get("SKEW_BENCH_FACT", "4000000"))
N_DIM = int(os.environ.get("SKEW_BENCH_DIM", "200000"))
HOT_FRAC = 0.5
N_SALTS = 8


def _spread(joined):
    """(wall_s, max_rows, median_rows, n_tasks) of the join stage."""
    t0 = time.perf_counter()
    rows = (
        joined.withColumn("_p", F.spark_partition_id())
        .groupBy("_p")
        .count()
        .collect()
    )
    wall = time.perf_counter() - t0
    counts = sorted(r["count"] for r in rows)
    return wall, counts[-1], statistics.median(counts), len(counts)


def main() -> None:
    from java9_gc_log_parser_spark.operators.enrich import salted_join
    from java9_gc_log_parser_spark.session import get_spark

    spark = get_spark(app_name="skew-bench", master="local[8]",
                      shuffle_partitions=32)
    # dim "too large to broadcast": disable broadcast the way a multi-GB
    # dim disables itself at scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    n_hot = int(N_FACT * HOT_FRAC)
    fact = (
        spark.range(N_FACT)
        .select(
            F.when(F.col("id") < n_hot, F.lit("conv-hot"))
            .otherwise(F.concat(F.lit("conv-"), (F.col("id") % 50000)))
            .alias("conv_id"),
            F.col("id").alias("row_id"),
        )
        .repartition(32, "row_id")  # arrival layout: hot rows everywhere
    )
    dim = spark.range(N_DIM).select(
        F.concat(F.lit("conv-"), F.col("id") % 50000).alias("conv_id"),
        (F.col("id") % 7).alias("attr"),
    ).union(
        spark.range(4).select(
            F.lit("conv-hot").alias("conv_id"), F.col("id").alias("attr")
        )
    )
    fact.localCheckpoint()  # materialize inputs outside the timed region
    dim.localCheckpoint()

    results = {}

    def leg(name, aqe_skew, salted):
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
                       "true" if aqe_skew else "false")
        if aqe_skew:
            # lower the fire thresholds so the split happens at bench scale
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "256k")
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
            # the spread probe aggregates right after the join, and
            # OptimizeSkewedJoin declines to split when the split would
            # add a shuffle before a downstream exchange — force it, as a
            # real pipeline whose join feeds an agg must too
            spark.conf.set(
                "spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        if salted:
            j = salted_join(fact, dim, "conv_id", salt_from="row_id",
                            n_salts=N_SALTS)
        else:
            j = fact.join(dim, "conv_id")
        wall, mx, med, n = _spread(j)
        results[name] = {
            "wall_s": round(wall, 2),
            "join_tasks": n,
            "max_rows_per_task": mx,
            "median_rows_per_task": med,
            "spread_max_over_median": round(mx / max(med, 1), 1),
        }
        print(f"LEG {name}: {results[name]}", file=sys.stderr, flush=True)

    leg("warmup", aqe_skew=False, salted=False)
    results.pop("warmup", None)
    leg("plain", aqe_skew=False, salted=False)
    leg("aqe_skew", aqe_skew=True, salted=False)
    leg("salted", aqe_skew=False, salted=True)
    leg("salted_plus_aqe", aqe_skew=True, salted=True)

    print(json.dumps({
        "bench": "skew_join_aqe_vs_salted",
        "n_fact": N_FACT, "n_dim": N_DIM, "hot_frac": HOT_FRAC,
        "n_salts": N_SALTS, "legs": results,
    }))


if __name__ == "__main__":
    main()
