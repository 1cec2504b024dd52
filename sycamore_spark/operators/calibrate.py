"""Score calibration: isotonic regression (pool-adjacent-violators) and its
step-function application.

A distilled quality classifier's raw scores rank documents well but their
VALUES aren't probabilities — thresholding at "0.9" means nothing until the
scores are calibrated against trusted labels (the LLM-annotated seed, a
human eval set). Isotonic regression (Zadrozny & Elkan 2002, "Transforming
classifier scores into accurate multiclass probability estimates"; the
PAV algorithm of Ayer et al. 1955) fits the least-squares NON-DECREASING
step function from score to label mean — the standard non-parametric
calibrator (sklearn's ``IsotonicRegression``), assuming only that more
score should never mean less quality.

Exactness contract: labels are non-negative INTEGERS (0/1 for binary
calibration), so every pooled block is an exact rational (sum_labels,
count) in bigint; PAVA merge comparisons are exact cross-products
(``num_prev * den_cur > num_cur * den_prev``) and the fitted value
quantizes half-up to micros in pure integer arithmetic
(``(2*num*1e6 + den) // (2*den)``) — the whole fit is bit-replayable in
ANSI SQL (the gate oracle replays the identical fold as a recursive CTE).
Tied scores pool into one block BEFORE the fold, so the fit never depends
on row order within a score.

Scale: calibration sets are seed-sized by contract (the LLM-labeled
sample, not the corpus) — the fit aggregates to one block per DISTINCT
score and folds those on a single task (warned via the plan-stats probe
when the input is estimated corpus-sized, the ``pack_shards`` pattern).
APPLYING the fit to a 100 TB corpus is the cheap side: the model is
driver-bounded by construction, so ``isotonic_apply`` collects it once
and compiles the step lookup into a balanced binary decision-tree
expression — O(log steps) comparisons per row inside whole-stage
codegen, ZERO shuffle and zero join on the corpus side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICROS = 1_000_000


def isotonic_fit(
    df: DataFrame,
    score_col: str,
    label_col: str,
    warn_above: int | None = 10_000_000,
) -> DataFrame:
    """Fit isotonic regression of ``label_col`` (non-negative integers) on
    ``score_col`` and return the calibration model AS a DataFrame — one
    row per distinct score: (score, n, n_pos, fitted_micros), with
    ``fitted_micros`` non-decreasing in score. Strict-violation pooling
    (merge only while the previous block's mean exceeds the current's);
    equal-mean neighbors stay separate — the fitted values are identical
    either way.
    """
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    from sycamore_spark.operators.sampling import _warn_global_window

    _warn_global_window(df, "isotonic_fit", warn_above)
    blocks = df.groupBy(F.col(score_col).alias("score")).agg(
        F.sum(F.col(label_col).cast("long")).alias("n_pos"),
        F.count(F.lit(1)).alias("n"),
    )
    out_schema = StructType(
        [
            StructField("score", blocks.schema["score"].dataType),
            StructField("n", LongType()),
            StructField("n_pos", LongType()),
            StructField("fitted_micros", LongType()),
        ]
    )

    def pava(it):
        parts = [p for p in it if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True).sort_values("score").reset_index(
            drop=True
        )
        nums = pdf["n_pos"].astype("int64").to_list()
        dens = pdf["n"].astype("int64").to_list()
        stack: list[list[int]] = []  # [num, den, n_blocks_covered]
        for num, den in zip(nums, dens):
            stack.append([num, den, 1])
            while (
                len(stack) >= 2
                and stack[-2][0] * stack[-1][1] > stack[-1][0] * stack[-2][1]
            ):
                a = stack.pop()
                stack[-1][0] += a[0]
                stack[-1][1] += a[1]
                stack[-1][2] += a[2]
        fitted = []
        for num, den, covered in stack:
            f = (2 * num * MICROS + den) // (2 * den)
            fitted.extend([f] * covered)
        yield pd.DataFrame(
            {
                "score": pdf["score"],
                "n": pdf["n"].astype("int64"),
                "n_pos": pdf["n_pos"].astype("int64"),
                "fitted_micros": pd.Series(fitted, dtype="int64"),
            }
        )

    # one block per distinct score — calibration-set-sized; the fold is
    # inherently sequential (each merge looks at the running stack), so a
    # single task runs it over the pre-aggregated blocks
    return blocks.repartition(1).mapInPandas(pava, out_schema)


def isotonic_fit_binned(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 1024,
) -> DataFrame:
    """Corpus-scale isotonic fit WITHOUT the seed-size contract: quantize
    scores into ``bins`` fixed-width buckets first, then run the exact
    PAVA fold over the bucket aggregates — the fold input is bounded by
    ``bins`` BY CONSTRUCTION, so the single-task fold stage is safe no
    matter how large ``df`` is (the standard binned-isotonic recipe;
    sklearn users get the same effect by subsampling, this keeps every
    label).

    Two corpus passes: one min/max aggregate (2 scalars, collected), one
    groupBy on the bucket id (≤ ``bins`` rows out) — both map-side
    combining hash aggregates, no window, no join. The returned model has
    ``score`` = each non-empty bucket's LOWER EDGE (mn + i*w in IEEE
    double — replayable cross-engine since both sides run the identical
    op sequence), so ``isotonic_apply`` works unchanged: a raw score in
    bucket i looks up the greatest edge <= score = bucket i's edge.
    NULL scores are excluded from the fit (and propagate NULL in apply).
    A constant-score input (mn == mx) degenerates to one bucket."""
    stats = (
        df.where(F.col(score_col).isNotNull())
        .agg(
            F.min(F.col(score_col).cast("double")).alias("mn"),
            F.max(F.col(score_col).cast("double")).alias("mx"),
        )
        .first()
    )
    if stats["mn"] is None:
        # empty / all-NULL input -> empty model (isotonic_fit's own empty
        # contract; applying it calibrates everything to NULL)
        return isotonic_fit(
            df.where(F.lit(False)).select(
                F.col(score_col).cast("double").alias("_edge"),
                F.col(label_col).alias("_lbl"),
            ),
            "_edge",
            "_lbl",
            warn_above=None,
        )
    mn, mx = float(stats["mn"]), float(stats["mx"])
    if mx == mn:
        w = 1.0
    else:
        w = (mx - mn) / bins
    s = F.col(score_col).cast("double")
    bucket = F.least(
        F.floor((s - F.lit(mn)) / F.lit(w)).cast("long"), F.lit(bins - 1)
    )
    binned = (
        df.where(F.col(score_col).isNotNull())
        .select(
            (F.lit(mn) + bucket.cast("double") * F.lit(w)).alias("_edge"),
            F.col(label_col).alias("_lbl"),
        )
    )
    # the inner fit's plan-stats warning is moot: distinct scores <= bins
    return isotonic_fit(binned, "_edge", "_lbl", warn_above=None)


def _step_lookup_tree(score: F.Column, steps: list, values: list) -> F.Column:
    """Compile a left-continuous step lookup into a balanced binary
    decision tree of comparisons: result = values[max i: steps[i] <= x],
    clamping x < steps[0] to values[0]. Expression size O(n), evaluation
    O(log n) comparisons per row — fully inside whole-stage codegen, no
    join, no shuffle (the treatment that fixed the packing family's
    single-task windows, VERDICT r12 item 1)."""

    def build(lo: int, hi: int) -> F.Column:
        if lo == hi:
            return F.lit(values[lo])
        mid = (lo + hi + 1) // 2
        return F.when(score < F.lit(steps[mid]), build(lo, mid - 1)).otherwise(
            build(mid, hi)
        )

    return build(0, len(steps) - 1)


def isotonic_apply(
    df: DataFrame,
    model: DataFrame,
    score_col: str,
    out_col: str = "calibrated_micros",
    max_steps: int = 1_000_000,
) -> DataFrame:
    """Apply a fitted calibration model to (possibly unseen) scores: each
    row gets the fitted value of the greatest model score <= its score
    (the step function's left-continuous extension); scores below the
    smallest model score clamp to the first step (sklearn's
    ``out_of_bounds='clip'``); NULL scores propagate NULL (not a
    masqueraded clamp).

    EAGER on the model side: the model is driver-bounded by construction
    (one row per distinct seed score, and after compressing runs of equal
    fitted values one row per PAVA block), so this collects it once,
    compresses it, and compiles the lookup into a balanced binary
    decision-tree expression — O(log steps) comparisons per corpus row
    inside whole-stage codegen, ZERO shuffle and zero join. The previous
    formulation (constant-key as-of join) funneled the whole corpus
    through one window task; this is the broadcast-literal fix named in
    VERDICT r12. ``max_steps`` guards the driver against a
    corpus-sized model being passed by mistake."""
    rows = (
        model.where(F.col("score").isNotNull())
        .select("score", "fitted_micros")
        .collect()
    )
    if not rows:
        # empty model (e.g. fit on an empty calibration set): nothing to
        # look up — every score calibrates to NULL (the r12 empty-input
        # contract, tests/test_empty_inputs.py)
        return df.withColumn(out_col, F.lit(None).cast("long"))
    if len(rows) > max_steps:
        raise ValueError(
            f"isotonic_apply: model has {len(rows)} steps > max_steps="
            f"{max_steps} — a calibration model should be seed-sized by "
            "contract; raise max_steps only if the driver can hold it"
        )
    rows.sort(key=lambda r: r["score"])
    steps: list = []
    values: list = []
    for r in rows:
        # runs of equal fitted values collapse to their first step: the
        # greatest-step-<=x lookup lands on the same fitted either way
        if not values or r["fitted_micros"] != values[-1]:
            steps.append(r["score"])
            values.append(r["fitted_micros"])
    score = F.col(score_col)
    # leaves are Python ints — force the model's LongType uniformly so
    # branch unification never downgrades to int32 on small fitted values
    lookup = _step_lookup_tree(score, steps, values).cast("long")
    return df.withColumn(
        out_col,
        F.when(score.isNull(), F.lit(None).cast("long")).otherwise(lookup),
    )
