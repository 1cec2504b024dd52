"""Isotonic calibration (PAVA): exact-rational pooling, step application."""

from pyspark.sql import functions as F

from sycamore_spark.operators.calibrate import isotonic_apply, isotonic_fit


def _pava_ref(blocks):
    """Driver-side strict-violation PAVA over (score-ordered) (num, den)."""
    st = []
    for num, den in blocks:
        st.append([num, den, 1])
        while len(st) >= 2 and st[-2][0] * st[-1][1] > st[-1][0] * st[-2][1]:
            a = st.pop()
            st[-1][0] += a[0]
            st[-1][1] += a[1]
            st[-1][2] += a[2]
    out = []
    for num, den, c in st:
        out.extend([(2 * num * 1_000_000 + den) // (2 * den)] * c)
    return out


def test_isotonic_fit_matches_reference_and_is_monotone(spark):
    rows = []
    for i, (score, labels) in enumerate(
        [(10, [1, 1, 0]), (20, [0]), (30, [1, 0]), (40, [0, 0, 0]), (50, [1, 1])]
    ):
        rows += [(score, l) for l in labels]
    df = spark.createDataFrame(rows, "score long, label long").repartition(5)
    model = isotonic_fit(df, "score", "label").orderBy("score").collect()
    blocks = [(2, 3), (0, 1), (1, 2), (0, 3), (2, 2)]
    assert [r.fitted_micros for r in model] == _pava_ref(blocks)
    fits = [r.fitted_micros for r in model]
    assert fits == sorted(fits)  # non-decreasing by construction
    assert [(r.n, r.n_pos) for r in model] == [(3, 2), (1, 0), (2, 1), (3, 0), (2, 2)]


def test_isotonic_fit_perfectly_ordered_is_identity_means(spark):
    df = spark.createDataFrame(
        [(1, 0), (1, 0), (2, 1), (2, 0), (3, 1), (3, 1)], "score long, label long"
    )
    model = {r.score: r.fitted_micros for r in isotonic_fit(df, "score", "label").collect()}
    assert model == {1: 0, 2: 500000, 3: 1000000}


def test_isotonic_apply_step_function_and_clip(spark):
    train = spark.createDataFrame(
        [(10, 0), (20, 1), (30, 1)], "score long, label long"
    )
    model = isotonic_fit(train, "score", "label")
    new = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 15), (4, 25), (5, 99)], "id long, score long"
    )
    out = {
        r.id: r.calibrated_micros
        for r in isotonic_apply(new, model, "score").collect()
    }
    # below min clamps to first step; between steps takes the left step
    assert out == {1: 0, 2: 0, 3: 0, 4: 1000000, 5: 1000000}


def test_isotonic_fit_single_score(spark):
    df = spark.createDataFrame([(7, 1), (7, 0)], "score long, label long")
    model = isotonic_fit(df, "score", "label").collect()
    assert len(model) == 1 and model[0].fitted_micros == 500000
