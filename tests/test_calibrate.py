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


def test_isotonic_apply_null_score_propagates(spark):
    """NULL scores stay NULL — not silently clamped to the first step."""
    train = spark.createDataFrame([(10, 0), (20, 1)], "score long, label long")
    model = isotonic_fit(train, "score", "label")
    new = spark.createDataFrame([(1, None), (2, 15)], "id long, score long")
    out = {r.id: r.calibrated_micros for r in isotonic_apply(new, model, "score").collect()}
    assert out == {1: None, 2: 0}


def test_isotonic_apply_no_shuffle_no_join(spark):
    """The apply side compiles to a pure projection: the executed plan has
    NO Exchange and NO join on the corpus subtree (VERDICT r12 item 1 —
    the old constant-key as-of join funneled the corpus through one
    window task)."""
    train = spark.createDataFrame(
        [(i, i % 2) for i in range(50)], "score long, label long"
    )
    model = isotonic_fit(train, "score", "label")
    corpus = spark.range(1000).select(
        F.col("id"), (F.col("id") % 60).alias("score")
    )
    out = isotonic_apply(corpus, model, "score")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan and "Window" not in plan
    assert out.count() == 1000


def test_isotonic_apply_compresses_equal_fit_runs(spark):
    """Scores pooled into one PAVA block share a fitted value; the compiled
    tree keeps only the first step of each run yet yields identical
    lookups at and between every original step."""
    # scores 1..4 all pool (violations), then 10 stands alone
    train = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 1), (4, 0), (10, 1)], "score long, label long"
    )
    model = isotonic_fit(train, "score", "label")
    fits = {r.score: r.fitted_micros for r in model.collect()}
    assert len(set(fits.values())) < len(fits)  # runs exist
    probe = spark.createDataFrame(
        [(s,) for s in [0, 1, 2, 3, 4, 5, 9, 10, 11]], "score long"
    )
    out = {r.score: r.calibrated_micros for r in isotonic_apply(probe, model, "score").collect()}
    for s, got in out.items():
        want = fits[max((k for k in fits if k <= s), default=min(fits))]
        assert got == want, (s, got, want)


def test_isotonic_apply_guards(spark):
    train = spark.createDataFrame([(10, 0), (20, 1)], "score long, label long")
    model = isotonic_fit(train, "score", "label")
    probe = spark.createDataFrame([(1,)], "score long")
    import pytest

    with pytest.raises(ValueError, match="max_steps"):
        isotonic_apply(probe, model, "score", max_steps=1)
    # empty model -> all-NULL output (the r12 empty-input contract),
    # not an error
    empty = model.where(F.lit(False))
    out = isotonic_apply(probe, empty, "score").collect()
    assert len(out) == 1 and out[0].calibrated_micros is None


def test_isotonic_fit_single_score(spark):
    df = spark.createDataFrame([(7, 1), (7, 0)], "score long, label long")
    model = isotonic_fit(df, "score", "label").collect()
    assert len(model) == 1 and model[0].fitted_micros == 500000


def test_isotonic_pava_properties_randomized():
    """PAVA invariants on random blocks (pure-Python twin of the executor
    fold — same integer arithmetic): fitted values are non-decreasing, the
    weighted total is preserved exactly in rational arithmetic, and each
    fitted value lies within the label range."""
    import random

    from fractions import Fraction

    rnd = random.Random(99)
    for _ in range(200):
        nblk = rnd.randint(1, 40)
        blocks = []
        for _ in range(nblk):
            den = rnd.randint(1, 9)
            blocks.append((rnd.randint(0, den), den))
        stack = []
        for num, den in blocks:
            stack.append([num, den])
            while (
                len(stack) >= 2
                and stack[-2][0] * stack[-1][1] > stack[-1][0] * stack[-2][1]
            ):
                a = stack.pop()
                stack[-1][0] += a[0]
                stack[-1][1] += a[1]
        means = [Fraction(n, d) for n, d in stack]
        assert means == sorted(means)  # monotone
        assert sum(n for n, _ in stack) == sum(n for n, _ in blocks)
        assert sum(d for _, d in stack) == sum(d for _, d in blocks)
        assert all(0 <= m <= 1 for m in means)


def test_isotonic_fit_weighted_total_preserved(spark):
    """The Spark fit preserves sum(label) == sum(fitted * n) exactly in
    rationals (checked at micro precision: |diff| <= 0.5 micro per distinct
    score from the half-up rounding)."""
    import random

    rnd = random.Random(3)
    rows = [(rnd.randint(0, 30), rnd.randint(0, 1)) for _ in range(400)]
    df = spark.createDataFrame(rows, "score long, label long")
    model = isotonic_fit(df, "score", "label").collect()
    total_label = sum(l for _, l in rows)
    total_fit = sum(r.fitted_micros * r.n for r in model) / 1_000_000.0
    # each row's fitted is its block mean rounded to micros: the summed
    # error is bounded by half a micro per weighted row
    assert abs(total_fit - total_label) <= 0.5e-6 * sum(r.n for r in model)


def test_isotonic_fit_binned_matches_python_reference(spark):
    from sycamore_spark.operators.calibrate import isotonic_fit_binned

    import random

    rnd = random.Random(11)
    rows = [(rnd.uniform(0, 100), 1 if rnd.random() < 0.01 * i else 0)
            for i, _ in enumerate(range(500))]
    # reference: same binning + same exact-rational PAVA driver-side
    bins = 16
    mn = min(s for s, _ in rows)
    mx = max(s for s, _ in rows)
    w = (mx - mn) / bins
    agg = {}
    for s, l in rows:
        b = min(int((s - mn) // w), bins - 1)
        edge = mn + b * w
        n, p = agg.get(edge, (0, 0))
        agg[edge] = (n + 1, p + l)
    blocks = [(p, n) for e, (n, p) in sorted(agg.items())]
    want = dict(zip(sorted(agg), _pava_ref(blocks)))
    df = spark.createDataFrame(rows, "score double, label long").repartition(7)
    model = {r.score: r.fitted_micros
             for r in isotonic_fit_binned(df, "score", "label", bins=bins).collect()}
    assert model == want
    assert len(model) <= bins
    fits = [model[k] for k in sorted(model)]
    assert fits == sorted(fits)


def test_isotonic_fit_binned_apply_composes(spark):
    from sycamore_spark.operators.calibrate import isotonic_apply, isotonic_fit_binned

    rows = [(float(i), 1 if i > 50 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "score double, label long")
    model = isotonic_fit_binned(df, "score", "label", bins=8)
    out = {r.score: r.calibrated_micros
           for r in isotonic_apply(df, model, "score").collect()}
    # step function: low scores ~0, high scores ~1e6, monotone overall
    assert out[0.0] == 0 and out[99.0] == 1_000_000
    vals = [out[k] for k in sorted(out)]
    assert vals == sorted(vals)


def test_isotonic_fit_binned_constant_and_null_scores(spark):
    from sycamore_spark.operators.calibrate import isotonic_fit_binned

    df = spark.createDataFrame(
        [(5.0, 1), (5.0, 0), (None, 1)], "score double, label long"
    )
    model = isotonic_fit_binned(df, "score", "label", bins=32).collect()
    assert len(model) == 1 and model[0].fitted_micros == 500000
    # all-NULL scores -> empty model (isotonic_fit's empty contract)
    allnull = spark.createDataFrame([(None, 1)], "score double, label long")
    assert isotonic_fit_binned(allnull, "score", "label").count() == 0
