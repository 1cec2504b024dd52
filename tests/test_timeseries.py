"""Gap-fill resampling (operators/timeseries.py) and corpus divergence
(operators/profiling.py)."""

import datetime as dt

from pyspark.sql import functions as F

from sycamore_spark.operators.profiling import corpus_divergence
from sycamore_spark.operators.timeseries import resample_fill


def test_resample_fill_locf_and_gaps(spark):
    base = dt.datetime(2026, 1, 1, 0, 30)
    rows = [
        (1, base, 10.0, 100),                              # hour 0
        (1, base + dt.timedelta(minutes=10), 11.0, 101),   # hour 0, later -> wins
        (1, base + dt.timedelta(hours=3), 40.0, 102),      # hour 3 (1, 2 are gaps)
        (2, base + dt.timedelta(hours=1), 7.0, 103),       # single point
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double, eid long")
    out = {(r.k, r.bucket_ts): r for r in resample_fill(df, "ts", "k", "v", 3600, "eid").collect()}
    k1 = sorted(bt for (k, bt) in out if k == 1)
    assert len(k1) == 4  # hours 0..3 dense
    assert out[(1, k1[0])].v == 11.0        # later event wins the cell
    assert out[(1, k1[1])].v is None        # gap cell
    assert out[(1, k1[1])].filled == 11.0   # LOCF
    assert out[(1, k1[2])].filled == 11.0
    assert out[(1, k1[3])].filled == 40.0
    assert len([1 for (k, _) in out if k == 2]) == 1


def test_resample_deterministic_tiebreak(spark):
    ts = dt.datetime(2026, 1, 1, 5, 0)
    df = spark.createDataFrame(
        [(1, ts, 1.0, 10), (1, ts, 2.0, 11)], "k long, ts timestamp, v double, eid long"
    )
    out = resample_fill(df, "ts", "k", "v", 3600, "eid").collect()
    assert len(out) == 1 and out[0].v == 2.0  # higher eid wins the tie


def test_corpus_divergence_properties(spark):
    df = spark.createDataFrame(
        [(i, "a", "x y z common") for i in range(20)]
        + [(100 + i, "b", "x y z common") for i in range(20)],
        "doc_id long, side string, text string",
    )
    same = corpus_divergence(df, "side", "a", "b").collect()[0]
    # identical distributions -> KL ~ 0 (exact 0 in nanos after quantization)
    assert abs(same.kl_ab_nanos) < 10 and abs(same.kl_ba_nanos) < 10
    df2 = spark.createDataFrame(
        [(i, "a", "alpha beta gamma") for i in range(20)]
        + [(100 + i, "b", "delta epsilon zeta") for i in range(20)],
        "doc_id long, side string, text string",
    )
    diff = corpus_divergence(df2, "side", "a", "b").collect()[0]
    assert diff.kl_ab_nanos > same.kl_ab_nanos * 10 + 1000
    assert diff.vocab == 6 and diff.n_tokens_a == 60
    # determinism across partitioning (integer sums)
    again = corpus_divergence(df2.repartition(7), "side", "a", "b").collect()[0]
    assert (diff.kl_ab_nanos, diff.kl_ba_nanos) == (again.kl_ab_nanos, again.kl_ba_nanos)


def test_categorical_divergence_properties(spark):
    from sycamore_spark.operators.profiling import categorical_divergence

    mk = lambda cells: spark.createDataFrame(  # noqa: E731
        [(i, c) for i, c in enumerate(cells)], "vec_id long, cell_id int"
    )
    same = categorical_divergence(mk([0, 1, 2, 3] * 10), mk([0, 1, 2, 3] * 10),
                                  "cell_id").collect()[0]
    # identical cell histograms -> KL ~ 0; counts/keys reported
    assert abs(same.kl_ab_nanos) < 10 and abs(same.kl_ba_nanos) < 10
    assert same.n_a == 40 and same.n_b == 40 and same.n_keys == 4
    drift = categorical_divergence(mk([0, 1, 2, 3] * 10), mk([3] * 40),
                                   "cell_id").collect()[0]
    assert drift.kl_ab_nanos > 100_000_000  # hub-cell batch: large drift
    # symmetric swap exchanges the two KLs exactly (integer nanos)
    swapped = categorical_divergence(mk([3] * 40), mk([0, 1, 2, 3] * 10),
                                     "cell_id").collect()[0]
    assert (swapped.kl_ab_nanos, swapped.kl_ba_nanos) == (
        drift.kl_ba_nanos, drift.kl_ab_nanos)
    # partitioning-independent (bigint sums)
    again = categorical_divergence(mk([0, 1, 2, 3] * 10).repartition(7),
                                   mk([3] * 40), "cell_id").collect()[0]
    assert (drift.kl_ab_nanos, drift.kl_ba_nanos) == (
        again.kl_ab_nanos, again.kl_ba_nanos)


def test_validate_expectations(spark):
    from sycamore_spark.operators.profiling import validate_expectations

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 2000.0)], "id long, v double"
    )
    got = {r.rule: r for r in validate_expectations(
        df, {"v_range": "v >= 0 AND v <= 1000", "id_pos": "id > 0"}
    ).collect()}
    # null v -> rule unevaluable -> counted as failure (conservative)
    assert got["v_range"].n_fail == 2 and got["v_range"].ok == 0
    assert got["id_pos"].n_fail == 0 and got["id_pos"].ok == 1
    assert all(r.n_rows == 3 for r in got.values())
