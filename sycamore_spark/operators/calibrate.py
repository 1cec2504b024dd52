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
APPLYING the fit to a 100 TB corpus is the cheap side: the model is a
broadcast-sized step table and ``isotonic_apply`` is one as-of join.
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


def isotonic_apply(
    df: DataFrame,
    model: DataFrame,
    score_col: str,
    out_col: str = "calibrated_micros",
) -> DataFrame:
    """Apply a fitted calibration model to (possibly unseen) scores: each
    row gets the fitted value of the greatest model score <= its score
    (the step function's left-continuous extension); scores below the
    smallest model score clamp to the first step (sklearn's
    ``out_of_bounds='clip'``). One as-of join against the broadcast-sized
    model — corpus-safe."""
    from sycamore_spark.operators.joins import asof_join

    mdl = model.select(
        F.lit(1).alias("_k"),
        F.col("score").alias("_mscore"),
        F.col("fitted_micros"),
    )
    left = df.withColumn("_k", F.lit(1))
    joined = asof_join(
        left,
        mdl,
        on="_k",
        left_ts=score_col,
        right_ts="_mscore",
        right_cols=["fitted_micros"],
        direction="backward",
    )
    # keyless aggregate (not orderBy().limit(1)) so the one-row clamp
    # broadcast is the recognized scalar-subquery BNL shape
    first_fit = model.agg(
        F.min_by("fitted_micros", "score").alias("_first_fit")
    )
    return (
        joined.crossJoin(F.broadcast(first_fit))
        .withColumn(
            out_col,
            F.coalesce(F.col("fitted_micros_right"), F.col("_first_fit")),
        )
        .drop("_k", "fitted_micros_right", "_first_fit")
    )
