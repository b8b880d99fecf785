from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from java9_gc_log_parser_spark.operators.layout import (
    range_boundaries,
    range_cluster,
    zone_map,
)


def _vals(spark, vals):
    return spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, v long")


def test_uniform_values_split_evenly(spark):
    df = _vals(spark, range(100))
    out = range_cluster(df, "v", n_clusters=4)
    sizes = {r.cluster: r.n for r in out.groupBy("cluster").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes == {0: 25, 1: 25, 2: 25, 3: 25}


def test_boundary_tie_goes_to_lower_cluster(spark):
    # [0,1,2] at n_clusters=2: the 0.5 percentile lands exactly on 1
    # (integer rank, interpolation exact) and 1 > 1 is false -> cluster 0
    df = _vals(spark, [0, 1, 2])
    got = {r.v: r.cluster for r in range_cluster(df, "v", 2).collect()}
    assert got == {0: 0, 1: 0, 2: 1}


def test_cluster_is_pure_function_of_data(spark):
    df = _vals(spark, [5, 1, 9, 3, 7, 2, 8, 4, 6, 0])
    a = sorted((r.v, r.cluster) for r in range_cluster(df, "v", 4).collect())
    b = sorted(
        (r.v, r.cluster)
        for r in range_cluster(df.repartition(7), "v", 4).collect()
    )
    assert a == b  # unlike repartitionByRange's sampled boundaries


def test_zone_map_disjoint_and_complete(spark):
    df = _vals(spark, range(0, 1000, 3))
    zm = zone_map(range_cluster(df, "v", 8), "v").collect()
    assert len(zm) == 8
    assert all(r.disjoint for r in zm)
    assert sum(r.n_rows for r in zm) == df.count()
    rows = sorted(zm, key=lambda r: r.cluster)
    for prev, cur in zip(rows, rows[1:]):
        assert prev.max_v < cur.min_v


def test_boundaries_require_two_clusters(spark):
    with pytest.raises(ValueError):
        range_boundaries(_vals(spark, [1, 2]), "v", 1)


def test_assignment_is_map_only_broadcast(spark):
    # no shuffle on the fact side: the boundary row arrives by broadcast
    df = _vals(spark, range(50))
    plan = range_cluster(df, "v", 4)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan
