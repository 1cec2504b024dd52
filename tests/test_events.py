"""Product-analytics operators (operators/events.py): funnels, cohorts,
interval coverage."""

import datetime as dt

from sycamore_spark.operators.events import (
    cohort_retention,
    funnel_counts,
    interval_union_length,
)


def _t(m):
    return dt.datetime(2026, 1, 1) + dt.timedelta(minutes=m)


def test_funnel_strict_order(spark):
    rows = [
        (1, "signup", _t(0)), (1, "click", _t(5)), (1, "purchase", _t(9)),   # full
        (2, "signup", _t(0)), (2, "click", _t(5)),                           # no purchase
        (3, "click", _t(0)), (3, "signup", _t(5)), (3, "purchase", _t(9)),   # click BEFORE signup -> stops at signup
        (4, "purchase", _t(0)),                                              # never signed up
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {r.step: r.users for r in funnel_counts(df, ["signup", "click", "purchase"]).collect()}
    assert got == {"signup": 3, "click": 2, "purchase": 1}


def test_cohort_retention_offsets(spark):
    week = dt.timedelta(days=7)
    rows = [
        (1, dt.datetime(2026, 1, 5)), (1, dt.datetime(2026, 1, 5) + week),   # cohort w, active w+1
        (2, dt.datetime(2026, 1, 5)),                                        # cohort w only
        (3, dt.datetime(2026, 1, 5) + week),                                 # cohort w+1
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r.cohort, r.offset): r.users for r in cohort_retention(df).collect()}
    cohorts = sorted({c for c, _ in got})
    w0, w1 = cohorts[0], cohorts[-1]
    assert got[(w0, 0)] == 2 and got[(w0, 1)] == 1 and got[(w1, 0)] == 1


def test_interval_union_overlaps_and_islands(spark):
    rows = [
        ("a", _t(0), _t(10)), ("a", _t(5), _t(12)),   # overlap -> one island, 12 min
        ("a", _t(20), _t(25)),                        # second island, 5 min
        ("b", _t(0), _t(1)),
    ]
    df = spark.createDataFrame(rows, "k string, s timestamp, e timestamp")
    got = {r.k: r for r in interval_union_length(df, "k", "s", "e").collect()}
    assert got["a"].covered_micros == 17 * 60 * 1_000_000 and got["a"].n_islands == 2
    assert got["b"].covered_micros == 60 * 1_000_000 and got["b"].n_islands == 1
    # contained interval adds nothing
    df2 = spark.createDataFrame(
        [("c", _t(0), _t(10)), ("c", _t(2), _t(3))], "k string, s timestamp, e timestamp"
    )
    r = interval_union_length(df2, "k", "s", "e").collect()[0]
    assert r.covered_micros == 10 * 60 * 1_000_000 and r.n_islands == 1


def test_cusum_detects_shift_and_peak_remembers(spark):
    from sycamore_spark.operators.monitor import cusum_by_key

    # stable around 10, then a sustained +10 shift, then recovery
    vals = [10.0] * 20 + [20.0] * 10 + [10.0] * 20
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)], "k string, t long, v double"
    )
    r = cusum_by_key(df, "k", "t", "v", target=10.0, slack=2.0).collect()[0]
    # during the shift the statistic accumulated (20-12)*10 = 80
    assert r.peak == 80.0
    # after recovery each step subtracts 2; 20 steps wipe 40 -> 40 remains
    assert r.cusum == 40.0
    # no shift -> flat zero
    df2 = spark.createDataFrame(
        [("k", i, 10.0) for i in range(30)], "k string, t long, v double"
    )
    r2 = cusum_by_key(df2, "k", "t", "v", target=10.0, slack=2.0).collect()[0]
    assert r2.cusum == 0.0 and r2.peak == 0.0


def test_event_transitions_matrix(spark):
    from sycamore_spark.operators.events import event_transitions

    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"),   # a->b, b->a
        (2, 1, "a"), (2, 2, "b"),                # a->b
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    got = {(r.prev_event, r.next_event): (r.n, r.p) for r in event_transitions(df, ts_col="ts").collect()}
    assert got[("a", "b")] == (2, 1.0)
    assert got[("b", "a")] == (1, 1.0)
    assert len(got) == 2  # no cross-user pair (user 1's 'a' never pairs with user 2's)


def test_frequent_paths_trigrams(spark):
    from sycamore_spark.operators.events import frequent_paths

    rows = [(1, i, e) for i, e in enumerate("abcabc")] + [(2, i, e) for i, e in enumerate("abc")]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    got = {(r.step_0, r.step_1, r.step_2): r.n for r in frequent_paths(df, 3).collect()}
    assert got[("a", "b", "c")] == 3  # twice in user 1, once in user 2
    assert got[("b", "c", "a")] == 1 and got[("c", "a", "b")] == 1
    top1 = frequent_paths(df, 3, top_k=1).collect()
    assert len(top1) == 1 and (top1[0].step_0, top1[0].n) == ("a", 3)


def test_zscore_outliers_flags_extremes(spark):
    from sycamore_spark.operators.monitor import zscore_outliers

    vals = [10.0] * 50 + [1000.0]
    df = spark.createDataFrame([(i, "g", v) for i, v in enumerate(vals)], "id long, g string, v double")
    out = zscore_outliers(df, "v", ["g"], threshold=3.0).collect()
    flagged = [r.id for r in out if r.is_outlier == 1]
    assert flagged == [50]
    # z of the constant bulk is negative and small; sum of z ~ 0
    assert abs(sum(r.z_micros for r in out)) < len(vals)


def test_mad_outliers_robust_to_contamination(spark):
    from sycamore_spark.operators.monitor import mad_outliers, zscore_outliers

    # 10% contamination at 1000x: MAD still flags all 5; the classic
    # masking failure makes plain z-score miss some at the same sigma cut
    vals = [float(10 + (i % 3)) for i in range(45)] + [10000.0] * 5
    df = spark.createDataFrame([(i, "g", v) for i, v in enumerate(vals)], "id long, g string, v double")
    m = mad_outliers(df, "v", ["g"], threshold=3.0).collect()
    assert sorted(r.id for r in m if r.is_outlier == 1) == [45, 46, 47, 48, 49]
    assert all(r.is_outlier == 0 for r in m if r.id < 45)


def test_mad_zero_mad_group(spark):
    from sycamore_spark.operators.monitor import mad_outliers

    df = spark.createDataFrame(
        [(i, "g", 7.0) for i in range(20)] + [(99, "g", 8.0)], "id long, g string, v double"
    )
    out = {r.id: r for r in mad_outliers(df, "v", ["g"]).collect()}
    assert out[99].is_outlier == 1 and out[99].mad_micros is None
    assert out[0].is_outlier == 0


def test_zscore_constant_group_is_safe_under_ansi(spark):
    # sd == 0: an unguarded division fails the whole query under Spark 4's
    # default ANSI mode; the guard defines z_micros NULL / is_outlier 0
    from sycamore_spark.operators.monitor import zscore_outliers

    df = spark.createDataFrame(
        [(i, "const", 5.0) for i in range(10)] + [(i, "var", float(i)) for i in range(10)],
        "id long, g string, v double",
    )
    out = zscore_outliers(df, "v", ["g"]).collect()
    const = [r for r in out if r.g == "const"]
    assert all(r.z_micros is None and r.is_outlier == 0 for r in const)
    assert any(r.z_micros is not None for r in out if r.g == "var")
