from __future__ import annotations

from pyspark.sql import functions as F

from java9_gc_log_parser_spark.operators.olap import (
    cents,
    grouping_sets_count,
    pricing_summary,
    star_revenue_by_nation,
)


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_cents_exact_on_2dp_doubles(spark):
    # the classic 0.1+0.2 class of doubles: cents() must hit the integer
    vals = [(0.07,), (44473.56,), (0.01,), (123.45,), (0.10,)]
    df = spark.createDataFrame(vals, "v double")
    got = [r.c for r in df.select(cents("v").alias("c")).collect()]
    assert got == [7, 4447356, 1, 12345, 10]


def test_pricing_summary_matches_python(spark):
    rows = [
        ("A", "F", 10.0, 100.10, 0.05, 0.02, "1997-01-01"),
        ("A", "F", 20.0, 200.20, 0.10, 0.04, "1997-06-01"),
        ("N", "O", 5.0, 50.50, 0.00, 0.00, "1997-03-01"),
        ("N", "O", 1.0, 10.00, 0.01, 0.08, "1999-01-01"),  # after cutoff
    ]
    df = spark.createDataFrame(
        rows,
        "l_returnflag string, l_linestatus string, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, _d string",
    ).withColumn("l_shipdate", F.col("_d").cast("timestamp"))
    out = {
        (r.l_returnflag, r.l_linestatus): r
        for r in pricing_summary(df).collect()
    }
    af = out[("A", "F")]
    assert af.count_order == 2
    assert af.sum_qty == 30.0
    assert af.sum_base_price == 300.30
    # exact integer arithmetic: 10010*95/1e4 + 20020*90/1e4
    assert af.sum_disc_price == round((10010 * 95 + 20020 * 90) / 1e4, 6)
    assert af.sum_charge == round(
        (10010 * 95 * 102 + 20020 * 90 * 104) / 1e6, 6
    )
    assert ("N", "O") in out and out[("N", "O")].count_order == 1  # cutoff


def test_pricing_summary_plan_pushdown_single_agg(spark, sf_dir):
    from java9_gc_log_parser_spark.storage import read_table

    df = pricing_summary(read_table(spark, f"{sf_dir}/lineitem.parquet"))
    plan = _plan(df)
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "LessThanOrEqual(l_shipdate" in pushed
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema  # pruned to the 7 used columns
    assert plan.count("+- Exchange") == 1  # one shuffle total


def test_star_revenue_dims_broadcast(spark, sf_dir):
    from java9_gc_log_parser_spark.storage import read_table

    t = lambda n: read_table(spark, f"{sf_dir}/{n}.parquet")  # noqa: E731
    df = star_revenue_by_nation(
        t("lineitem"), t("orders"), t("customer"), t("nation"), t("region")
    )
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    rows = {r.n_name: r for r in df.collect()}
    assert rows and all(r.revenue > 0 for r in rows.values())


def test_grouping_sets_one_pass(spark, sf_dir):
    from java9_gc_log_parser_spark.sources.transcripts import synth_transcripts

    df = grouping_sets_count(synth_transcripts(spark, sf_dir), "role", "tool")
    plan = _plan(df)
    assert "Expand" in plan
    assert plan.count("+- Exchange") == 1
    rows = df.collect()
    total = [r for r in rows if r.gid == 3]
    assert len(total) == 1  # grand total once
    n_all = total[0].n_rows
    # every grain re-sums to the grand total
    for gid in (0, 1, 2):
        assert sum(r.n_rows for r in rows if r.gid == gid) == n_all
