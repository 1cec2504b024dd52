"""Mergeable sketch aggregations (operators/sketches.py): error bounds vs
exact, rollup-vs-direct consistency, and set-algebra sanity."""

from pyspark.sql import functions as F

from sycamore_spark.operators.sketches import (
    hll_distinct,
    hll_rollup,
    hll_sketches,
    kll_quantiles,
    theta_overlap,
)


def _events(spark, n=20000):
    return spark.range(n).selectExpr(
        "id",
        "id % 4211 AS user_id",  # ~4211 distinct users
        "CASE WHEN id % 2 = 0 THEN 'click' ELSE 'view' END AS event_type",
        "id % 7 AS day",
        "cast(id % 1009 AS double) AS value",
    )


def test_hll_distinct_within_bound(spark):
    df = _events(spark)
    got = {r.event_type: r.approx_user_id_distinct for r in hll_distinct(df, "user_id", ["event_type"]).collect()}
    exact = {
        r.event_type: r.n
        for r in df.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    for k, e in exact.items():
        assert abs(got[k] - e) <= 0.05 * e


def test_hll_rollup_matches_direct_estimate_bound(spark):
    df = _events(spark)
    daily = hll_sketches(df, "user_id", ["event_type", "day"])
    rolled = {r.event_type: r.approx_distinct for r in hll_rollup(daily, ["event_type"]).collect()}
    exact = {
        r.event_type: r.n
        for r in df.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    for k, e in exact.items():
        assert abs(rolled[k] - e) <= 0.05 * e


def test_kll_quantile_rank_bound(spark):
    df = _events(spark)
    approx = {r.event_type: r.approx_q9 for r in kll_quantiles(df, "value", [0.9], ["event_type"]).collect()}
    for etype, q in approx.items():
        vals = [r.value for r in df.filter(F.col("event_type") == etype).select("value").collect()]
        rank = sum(1 for v in vals if v <= q) / len(vals)
        assert 0.85 <= rank <= 0.95


def test_theta_overlap_estimates(spark):
    # A = users 0..999, B = users 500..1499 -> |A n B| = 500, |A u B| = 1500
    df = spark.range(4000).selectExpr(
        "CASE WHEN id < 2000 THEN id % 1000 ELSE 500 + id % 1000 END AS user_id",
        "CASE WHEN id < 2000 THEN 'a' ELSE 'b' END AS side",
    )
    row = theta_overlap(df, "user_id", "side", "a", "b").collect()[0]
    assert abs(row.approx_a - 1000) <= 50
    assert abs(row.approx_b - 1000) <= 50
    assert abs(row.approx_union - 1500) <= 75
    assert abs(row.approx_intersection - 500) <= 75
    assert abs(row.approx_a_minus_b - 500) <= 75


def test_sketch_aggregates_are_jvm_native(spark):
    """No Python evaluation in the plan — sketches must stay JVM-side."""
    df = _events(spark)
    plan = hll_distinct(df, "user_id", ["event_type"])._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
