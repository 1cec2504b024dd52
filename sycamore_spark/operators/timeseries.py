"""Time-series regularization: gap-fill resampling onto a fixed grid.

Event streams land irregularly; downstream feature pipelines want one row
per (key, time-bucket) with gaps forward-filled — the hypertable
``time_bucket_gapfill`` / ``locf`` shape. Spark-first decomposition:

1. bucket each event to its grid cell (integer epoch division — exact);
2. one aggregate keeps the LAST event per (key, cell), deterministically
   (row_number over ts desc with an id tie-break, not ``max_by``, whose
   tie behavior is engine-defined);
3. a per-key dense spine is generated with ``sequence`` + ``explode``
   from the key's observed [min, max] cell range (no driver collect, no
   cross join — each key generates only its own range);
4. a left join puts observations on the spine and
   ``last(value, ignorenulls=True)`` over an ordered window carries the
   previous observation across gaps (LOCF).

Two shuffles total (the cell aggregate and the spine window share the
key partitioning). The spine explode is the only row-amplifying step —
its size is the GRID, bounded by time-range/step per key, independent of
event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sycamore_spark.functions.time import epoch_micros


def resample_fill(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    step_seconds: int,
    id_col: str | None = None,
) -> DataFrame:
    """Regularize ``df`` onto a ``step_seconds`` grid per ``key_col``:
    returns (key, bucket_ts epoch-seconds, value, filled) where ``value``
    is the last observation in the cell (null for gap cells) and
    ``filled`` carries it forward. ``id_col`` breaks same-timestamp ties
    deterministically."""
    step_us = int(step_seconds) * 1_000_000
    cell = F.floor(epoch_micros(F.col(ts_col)) / F.lit(step_us)).cast("long")
    order = [F.col(ts_col).desc()] + ([F.col(id_col).desc()] if id_col else [])
    tagged = df.withColumn("_cell", cell)
    picked = (
        tagged.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(F.col(key_col), F.col("_cell")).orderBy(*order)
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(F.col(key_col).alias("_k"), "_cell", F.col(value_col).alias("_v"))
    )
    spine = (
        tagged.groupBy(F.col(key_col).alias("_k"))
        .agg(F.min("_cell").alias("_lo"), F.max("_cell").alias("_hi"))
        .select("_k", F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("_cell"))
    )
    joined = spine.join(picked, ["_k", "_cell"], "left")
    w_fill = (
        Window.partitionBy("_k").orderBy(F.col("_cell").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col("_k").alias(key_col),
        (F.col("_cell") * F.lit(step_seconds)).alias("bucket_ts"),
        F.col("_v").alias(value_col),
        F.last("_v", ignorenulls=True).over(w_fill).alias("filled"),
    )


def rolling_quantile(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    q: float = 0.5,
    window_rows: int = 10,
    out_col: str | None = None,
) -> DataFrame:
    """Trailing exact quantile over the last ``window_rows`` rows per key
    (rolling median by default) — the robust smoother for monitoring
    feeds, as a native windowed ``percentile`` (identical linear
    interpolation to ANSI ``quantile_cont``, so rolling values replay
    bit-for-bit). One window shuffle on the key; the frame is row-bounded
    so state per row is O(window)."""
    w = (
        Window.partitionBy(F.col(key_col)).orderBy(F.col(order_col).asc())
        .rowsBetween(-(window_rows - 1), Window.currentRow)
    )
    return df.withColumn(
        out_col or f"rolling_q{str(q).replace('0.', '')}",
        F.percentile(F.col(value_col), F.lit(q)).over(w),
    )


def trend_fit(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group ordinary-least-squares trend line — the metric-drift /
    growth-rate fit run over every (source, metric) series in a corpus
    report. Returns one row per group: (n, slope_micros, intercept_micros)
    with slope in y-micro-units per x-unit.

    Exactness discipline (operators/incremental.py): y is quantized to
    integer micros FIRST, so all five sufficient statistics
    (n, Σx, Σy, Σxy, Σx²) are exact DECIMAL(38,0) integers — associative,
    partition-order-independent, and bit-replayable in ANSI SQL. The
    closed forms

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²)
        intercept = (Σy − slope·Σx) / n

    are then evaluated in float64 on those exact integers, identically on
    any engine. Zero-variance x (single point / constant x) yields NULL.
    One hash aggregate; nothing else moves."""
    gcols = group_cols or []
    x = F.col(x_col).cast("decimal(38,0)")
    ym = F.floor(F.col(y_col).cast("double") * F.lit(1e6) + F.lit(0.5)).cast("decimal(38,0)")
    agg = df.groupBy(*[F.col(c) for c in gcols]).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        F.sum(x).cast("decimal(38,0)").alias("_sx"),
        F.sum(ym).cast("decimal(38,0)").alias("_sy"),
        F.sum((x * ym).cast("decimal(38,0)")).cast("decimal(38,0)").alias("_sxy"),
        F.sum((x * x).cast("decimal(38,0)")).cast("decimal(38,0)").alias("_sxx"),
    )
    n = F.col("_n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx = F.col("_sxx").cast("double")
    den = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / den
    intercept = (sy - slope * sx) / n
    q = lambda c: F.floor(c + F.lit(0.5)).cast("long")  # noqa: E731
    return agg.select(
        *gcols,
        F.col("_n").cast("bigint").alias("n"),
        F.when(den > F.lit(0.0), q(slope)).alias("slope_micros"),
        F.when(den > F.lit(0.0), q(intercept)).alias("intercept_micros"),
    )


def seasonal_residuals(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    bucket_seconds: int = 3600,
    period_buckets: int = 24,
) -> DataFrame:
    """Seasonal-naive anomaly residuals: aggregate the series into fixed
    buckets (hourly by default), then residual = bucket mean − the mean
    one SEASON earlier (24 buckets = same hour yesterday). The first
    detrending every seasonal metric needs before thresholding — plain
    z-scores flag every rush hour.

    The prior-season lookup is an equi-join on (group, bucket − period),
    NOT a lag window: missing buckets must yield NULL (no earlier season
    observed), where ``lag(period)`` would silently reach past gaps to
    the wrong season. Returns (group..., bucket, mean_micros,
    resid_micros). Two hash aggregates + one self-join, all keyed on the
    bucket — nothing scans twice."""
    from sycamore_spark.functions.time import epoch_micros

    gcols = group_cols or []
    us = epoch_micros(F.col(ts_col))
    step = F.lit(int(bucket_seconds) * 1_000_000)
    bucket = ((us - F.pmod(us, step)) / step).cast("long")
    v = F.col(value_col).cast("decimal(18,3)")
    agg = (
        df.withColumn("_b", bucket)
        .groupBy(*[F.col(c) for c in gcols], F.col("_b"))
        .agg(F.count(F.lit(1)).alias("_n"), F.sum(v).cast("decimal(28,3)").alias("_s"))
    )
    mean_micros = F.floor(
        F.col("_s").cast("double") / F.col("_n").cast("double") * F.lit(1e6) + F.lit(0.5)
    ).cast("long")
    cur = agg.select(*gcols, F.col("_b").alias("bucket"), mean_micros.alias("mean_micros"))
    prev = cur.select(
        *gcols,
        (F.col("bucket") + F.lit(int(period_buckets))).alias("bucket"),
        F.col("mean_micros").alias("_prev"),
    )
    out = cur.join(prev, [*gcols, "bucket"], "left")
    return out.select(
        *gcols, "bucket", "mean_micros",
        (F.col("mean_micros") - F.col("_prev")).alias("resid_micros"),
    )
