

# -------------------------------------------------- exact quantile select


def test_exact_quantile_matches_sorted_ground_truth(spark):
    import random

    from java9_gc_log_parser_spark.operators.sketches import (
        exact_quantile_select,
    )

    rng = random.Random(7)
    vals = [round(rng.uniform(0.1, 500.0), 2) for _ in range(2000)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "event_id long, value double"
    )
    out = {r["q"]: r for r in
           exact_quantile_select(df, quantiles=(0.0, 0.5, 0.99, 1.0))
           .collect()}
    centi = sorted(int(v * 100 + 1e-9) for v in vals)
    n = len(centi)
    for q in (0.0, 0.5, 0.99, 1.0):
        k = int((n - 1) * q)
        assert out[q]["value_centi"] == centi[k], q
        assert out[q]["rank"] == k
        assert out[q]["n"] == n


def test_exact_quantile_duplicate_heavy_bucket(spark):
    from java9_gc_log_parser_spark.operators.sketches import (
        exact_quantile_select,
    )

    # 90% of mass on one value (one hot bucket): selection still exact
    vals = [5.0] * 900 + [float(i) for i in range(1, 101)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "event_id long, value double"
    )
    [r] = exact_quantile_select(df, quantiles=(0.5,)).collect()
    assert r["value_centi"] == 500
    assert r["bucket_rows"] >= 900
