"""Pipeline-drift monitoring operators.

A 100 TB ingest pipeline needs continuous signals about its own data:
is mean document quality drifting per source, is a domain's token rate
spiking, did a crawler start emitting garbage. ``ewma_by_key`` is the
classic smoothed per-key signal those monitors compare against.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def ewma_by_key(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.1,
    out_col: str = "ewma",
) -> DataFrame:
    """Final exponentially-weighted moving average of ``value_col`` per
    key, folding rows in ``order_col`` order (must be a total order
    within each key): ``acc = v0; acc = acc*(1-alpha) + alpha*v``.

    The fold is sequential by definition — it runs as one Arrow-batched
    ``applyInPandas`` per key (one shuffle on the key; each key's history
    must fit a task, which holds for per-source/per-domain monitoring).
    Because the fold order is total and both engines execute the identical
    IEEE operation sequence, the result is bit-replayable in SQL as a
    ``list_reduce`` over an ordered list aggregate.

    Returns (key, n, ewma).
    """
    a = float(alpha)
    key_type = df.schema[key_col].dataType.simpleString()

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        v = pdf[value_col].astype("float64").to_numpy()
        acc = v[0]
        for x in v[1:]:
            acc = acc * (1.0 - a) + a * x
        return pd.DataFrame({key_col: [pdf[key_col].iloc[0]], "n": [len(v)], out_col: [acc]})

    return (
        df.select(key_col, order_col, value_col)
        .groupBy(key_col)
        .applyInPandas(_fold, schema=f"{key_col} {key_type}, n bigint, {out_col} double")
    )


def cusum_by_key(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    target: float,
    slack: float = 0.0,
    out_col: str = "cusum",
) -> DataFrame:
    """One-sided CUSUM level-shift detector per key: folding rows in
    ``order_col`` order, ``acc = max(0, acc + (v - target - slack))`` —
    the sequential-probability shift statistic that catches a sustained
    upward drift long before a mean comparison does (alarm when the
    final statistic exceeds a threshold h of your choosing).

    Same execution/replay contract as ``ewma_by_key``: one Arrow fold per
    key, total fold order, identical IEEE op sequence both engines — so
    the statistic replays bit-exactly in SQL as a ``list_reduce`` over an
    ordered list. Returns (key, n, cusum, peak) — ``peak`` is the maximum
    the statistic reached, so a shift that later recovered still alarms.
    """
    t, s = float(target), float(slack)
    key_type = df.schema[key_col].dataType.simpleString()

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        v = pdf[value_col].astype("float64").to_numpy()
        acc = 0.0
        peak = 0.0
        for x in v:
            acc = acc + (x - t - s)
            if acc < 0.0:
                acc = 0.0
            if acc > peak:
                peak = acc
        return pd.DataFrame(
            {key_col: [pdf[key_col].iloc[0]], "n": [len(v)], out_col: [acc], "peak": [peak]}
        )

    return (
        df.select(key_col, order_col, value_col)
        .groupBy(key_col)
        .applyInPandas(
            _fold, schema=f"{key_col} {key_type}, n bigint, {out_col} double, peak double"
        )
    )


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    threshold: float = 3.0,
) -> DataFrame:
    """Per-group z-score outlier flagging: mean/stddev derived from exact
    decimal sums (operators/incremental.py discipline), the z statistic
    quantized to integer micros so the flag boundary is bit-identical on
    any engine. Returns the input plus (z_micros, is_outlier). One
    stats aggregate broadcast back; the data is not reshuffled.

    Zero-variance groups (sd == 0): every value equals the mean, so no
    point can be an outlier — z_micros is NULL and is_outlier is 0. The
    CASE short-circuits the division, so the query is safe under Spark 4's
    default ANSI mode (an unguarded /0 would fail the whole job with
    DIVIDE_BY_ZERO; mad_outliers guards its zero-MAD case the same way)."""
    from pyspark.sql import functions as F

    gcols = group_cols or []
    v = F.col(value_col).cast("decimal(18,3)")
    stats = df.groupBy(*[F.col(c) for c in gcols]).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(v).cast("decimal(28,3)").alias("_sum"),
        F.sum((v * v).cast("decimal(30,6)")).cast("decimal(38,6)").alias("_sq"),
    )
    j = df.join(F.broadcast(stats), gcols) if gcols else df.crossJoin(F.broadcast(stats))
    n = F.col("_n").cast("double")
    mean = F.col("_sum").cast("double") / n
    var = F.col("_sq").cast("double") / n - mean * mean
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = F.when(sd > F.lit(0.0), (F.col(value_col).cast("double") - mean) / sd)
    z_micros = F.floor(z * F.lit(1e6) + F.lit(0.5)).cast("long")
    return (
        j.withColumn("z_micros", z_micros)
        .withColumn(
            "is_outlier",
            F.coalesce(
                (F.abs(F.col("z_micros")) > F.lit(int(threshold * 1e6))).cast("bigint"),
                F.lit(0).cast("bigint"),
            ),
        )
        .drop("_n", "_sum", "_sq")
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    threshold: float = 3.5,
) -> DataFrame:
    """Robust outlier flags via the median absolute deviation — the
    detector to use when the contamination itself corrupts mean/stddev
    (zscore_outliers' known failure mode): score = (v - median) / MAD,
    flagged when |score| exceeds ``threshold`` (3.5 is the classic
    Iglewicz-Hoaglin cut for 0.6745-scaled scores; this uses the raw
    MAD denominator so pick the threshold accordingly).

    Two exact-percentile aggregates (median, then median of absolute
    deviations — Spark percentile == DuckDB quantile_cont bit-for-bit)
    broadcast back; scores quantize to integer micros so the boundary is
    engine-exact. Zero-MAD groups (constant bulk) flag any deviation.
    Returns the input plus (mad_micros, is_outlier)."""
    from pyspark.sql import functions as F

    gcols = group_cols or []
    med = df.groupBy(*[F.col(c) for c in gcols]).agg(
        F.percentile(F.col(value_col), F.lit(0.5)).alias("_med")
    )
    j1 = df.join(F.broadcast(med), gcols) if gcols else df.crossJoin(F.broadcast(med))
    dev = F.abs(F.col(value_col).cast("double") - F.col("_med"))
    mad = j1.groupBy(*[F.col(c) for c in gcols]).agg(
        F.percentile(dev, F.lit(0.5)).alias("_mad")
    )
    j2 = j1.join(F.broadcast(mad), gcols) if gcols else j1.crossJoin(F.broadcast(mad))
    score = (F.col(value_col).cast("double") - F.col("_med")) / F.col("_mad")
    score_micros = F.floor(score * F.lit(1e6) + F.lit(0.5)).cast("long")
    zero_mad = F.col("_mad") == F.lit(0.0)
    deviates = F.col(value_col).cast("double") != F.col("_med")
    return (
        j2.withColumn("mad_micros", F.when(zero_mad, F.lit(None)).otherwise(score_micros))
        .withColumn(
            "is_outlier",
            F.when(zero_mad, deviates.cast("bigint")).otherwise(
                (F.abs(F.col("mad_micros")) > F.lit(int(threshold * 1e6))).cast("bigint")
            ),
        )
        .drop("_med", "_mad")
    )
