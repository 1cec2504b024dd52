"""As-of join + salted join (operators/joins.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sycamore_spark.operators.joins import asof_join, salted_join


def t(minute):
    return dt.datetime(2026, 1, 1, 12, minute)


@pytest.fixture(scope="module")
def frames(spark):
    clicks = spark.createDataFrame(
        [(1, t(10), "c1"), (1, t(30), "c2"), (2, t(5), "c3"), (3, t(1), "c4")],
        "user_id long, ts timestamp, click_id string",
    )
    purchases = spark.createDataFrame(
        [(1, t(8), 100.0), (1, t(30), 250.0), (2, t(9), 50.0)],
        "user_id long, ts timestamp, amount double",
    )
    return clicks, purchases


def test_asof_backward_inclusive(spark, frames):
    clicks, purchases = frames
    out = asof_join(clicks, purchases, on="user_id")
    got = {r["click_id"]: (r["amount_right"], r["ts_right"]) for r in out.collect()}
    assert got["c1"] == (100.0, t(8))
    assert got["c2"] == (250.0, t(30))   # inclusive: same-ts purchase matches
    assert got["c3"] == (None, None)     # purchase after click
    assert got["c4"] == (None, None)     # no purchases for user 3


def test_asof_strict(spark, frames):
    clicks, purchases = frames
    out = asof_join(clicks, purchases, on="user_id", strict=True)
    got = {r["click_id"]: r["amount_right"] for r in out.collect()}
    assert got["c2"] == 100.0  # same-ts excluded, falls back to t(8)


def test_asof_single_shuffle(spark, frames):
    clicks, purchases = frames
    plan = asof_join(clicks, purchases, on="user_id")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_salted_join_matches_plain(spark):
    probe = spark.createDataFrame(
        [(i % 3, f"p{i}") for i in range(100)], "k long, v string"
    )
    build = spark.createDataFrame([(0, "x"), (1, "y"), (2, "z")], "k long, w string")
    plain = {(r["k"], r["v"], r["w"]) for r in probe.join(build, "k").collect()}
    salted = {(r["k"], r["v"], r["w"]) for r in salted_join(probe, build, "k", salt=8).collect()}
    assert salted == plain


def test_salted_join_rejects_outer_on_build(spark):
    probe = spark.createDataFrame([(1, "p")], "k long, v string")
    build = spark.createDataFrame([(1, "x"), (2, "y")], "k long, w string")
    import pytest

    with pytest.raises(ValueError, match="duplicate"):
        salted_join(probe, build, "k", how="right")
    with pytest.raises(ValueError, match="duplicate"):
        salted_join(probe, build, "k", how="full")


def test_salted_join_probe_id_spreads_duplicate_rows(spark):
    # 200 identical probe rows: hashing all columns puts them in ONE salt
    # bucket; salting on the row-unique id spreads them across buckets.
    probe = spark.createDataFrame(
        [(i, 7, "same") for i in range(200)], "rid long, k long, v string"
    )
    build = spark.createDataFrame([(7, "x")], "k long, w string")
    out = salted_join(probe, build, "k", salt=8, probe_id="rid")
    assert out.count() == 200
    from pyspark.sql import functions as F

    n_buckets = (
        probe.withColumn("_s", F.pmod(F.hash("rid"), F.lit(8))).select("_s").distinct().count()
    )
    assert n_buckets > 4  # well spread despite identical payload columns


def test_interval_join(spark):
    points = spark.createDataFrame(
        [(1, t(0), "p0"), (1, t(15), "p1"), (1, t(59), "p2"), (2, t(15), "p3")],
        "user_id long, ts timestamp, pid string",
    )
    intervals = spark.createDataFrame(
        [(1, t(10), t(20), "w1"), (1, t(59), t(59), "empty"), (2, t(0), t(59), "w2")],
        "user_id long, start_ts timestamp, end_ts timestamp, iid string",
    )
    from sycamore_spark.operators.joins import interval_join

    out = interval_join(points, intervals, on="user_id", bucket_seconds=600)
    got = {(r["pid"], r["iid"]) for r in out.collect()}
    assert got == {("p1", "w1"), ("p3", "w2")}
    # plan is an equi-join (hash), never a nested-loop/cartesian
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_bloom_join_equals_plain_join(spark):
    from sycamore_spark.operators.joins import bloom_join

    big = spark.range(20000).selectExpr("id", "id % 500 AS k", "id * 2 AS payload")
    small = spark.range(50).selectExpr("id * 7 AS sk", "id AS dim")  # keys 0,7,...,343
    got = bloom_join(big, small, "k", "sk", nbits=1 << 12)
    want = big.join(small, big["k"] == small["sk"], "inner")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    semi = bloom_join(big, small, "k", "sk", how="left_semi", nbits=1 << 12)
    want_semi = big.join(small, big["k"] == small["sk"], "left_semi")
    assert sorted(map(tuple, semi.collect())) == sorted(map(tuple, want_semi.collect()))


def test_bloom_join_rejects_outer(spark):
    import pytest
    from sycamore_spark.operators.joins import bloom_join

    df = spark.range(10).selectExpr("id AS k")
    with pytest.raises(ValueError):
        bloom_join(df, df, "k", how="left")


def test_asof_join_directions(spark):
    from sycamore_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, "l10"), (1, 20, "l20"), (1, 35, "l35"), (2, 5, "l5")],
        "k long, ts long, lv string",
    )
    right = spark.createDataFrame(
        [(1, 8, "r8"), (1, 20, "r20"), (1, 30, "r30"), (1, 100, "r100")],
        "k long, ts long, rv string",
    )
    def run(**kw):
        rows = asof_join(left, right, "k", **kw).collect()
        return {(r.k, r.ts): r.rv_right for r in rows}

    bwd = run()
    assert bwd == {(1, 10): "r8", (1, 20): "r20", (1, 35): "r30", (2, 5): None}
    fwd = run(direction="forward")
    assert fwd == {(1, 10): "r20", (1, 20): "r20", (1, 35): "r100", (2, 5): None}
    fwd_strict = run(direction="forward", strict=True)
    assert fwd_strict[(1, 20)] == "r30"
    near = run(direction="nearest")
    # 10: gaps 2 vs 10 -> r8; 35: gaps 5 vs 65 -> r30; equidistant ties -> backward
    assert near == {(1, 10): "r8", (1, 20): "r20", (1, 35): "r30", (2, 5): None}
    # equidistant: left at 25 between r20 and r30 -> backward wins
    l2 = spark.createDataFrame([(1, 25, "l25")], "k long, ts long, lv string")
    n2 = asof_join(l2, right, "k", direction="nearest").collect()[0]
    assert n2.rv_right == "r20"


def test_asof_join_nearest_rejects_strict(spark):
    import pytest
    from sycamore_spark.operators.joins import asof_join

    df = spark.createDataFrame([(1, 1)], "k long, ts long")
    with pytest.raises(ValueError):
        asof_join(df, df, "k", direction="nearest", strict=True)


def test_fuzzy_join_complete_within_distance(spark):
    from pyspark.sql import functions as F
    from sycamore_spark.operators.joins import fuzzy_join

    left = spark.createDataFrame(
        [("kitten",), ("chair",), ("zzzz",)], "a string"
    )
    right = spark.createDataFrame(
        [("sitting",), ("mitten",), ("chairs",), ("hair",), ("table",)], "b string"
    )
    got = {(r.a, r.b) for r in fuzzy_join(left, right, "a", "b", max_distance=2).collect()}
    # brute-force reference: the blocked join must equal the cross join
    brute = left.crossJoin(right).filter(F.levenshtein("a", "b") <= 2)
    want = {(r.a, r.b) for r in brute.collect()}
    assert got == want and ("kitten", "mitten") in got and ("chair", "chairs") in got
    semi = fuzzy_join(left, right, "a", "b", max_distance=2, how="left_semi").collect()
    assert sorted(r.a for r in semi) == ["chair", "kitten"]


def test_rolling_quantile_window(spark):
    from sycamore_spark.operators.timeseries import rolling_quantile

    df = spark.createDataFrame(
        [("k", i, float(i)) for i in range(1, 8)], "k string, t long, v double"
    )
    out = {r.t: r.rolling_q5 for r in rolling_quantile(df, "k", "t", "v", 0.5, 3).collect()}
    assert out[1] == 1.0      # window [1]
    assert out[2] == 1.5      # [1,2] interpolated
    assert out[7] == 6.0      # [5,6,7]


def test_asof_join_warns_on_literal_key(spark):
    """A constant `on` key funnels the corpus through one window task —
    asof_join now warns at call time (VERDICT r12 item 5)."""
    import warnings

    from sycamore_spark.operators.joins import asof_join

    left = spark.range(10).select(
        F.lit(1).alias("_k"), F.col("id").alias("ts"), F.col("id").alias("v")
    )
    right = spark.createDataFrame([(1, 5, 99)], "_k long, ts long, fit long")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        asof_join(left, right, on="_k", left_ts="ts", right_ts="ts")
    assert any("single task" in str(x.message) for x in w)
    # a real key does not warn
    left2 = spark.range(10).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("ts")
    )
    right2 = spark.createDataFrame([(0, 5, 1)], "k long, ts long, fit long")
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        asof_join(left2, right2, on="k", left_ts="ts", right_ts="ts")
    assert not any("single task" in str(x.message) for x in w2)
