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
