"""Event-time normalization helpers.

Spark 4 reads naive parquet ``timestamp[us]`` columns as ``TIMESTAMP_NTZ``,
which (a) cannot be cast to numeric types and (b) is rejected by
``withWatermark`` (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). Every operator that
does epoch arithmetic or event-time windowing goes through these helpers so
both timestamp flavors (and raw numeric epochs) behave identically.

The session timezone is pinned to UTC everywhere (context.init /
sources.tables.ensure_conf), so the NTZ -> TIMESTAMP cast is a deterministic
relabeling with no DST dependence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def epoch_micros(col: Column | str) -> Column:
    """Exact integer microseconds since the epoch for TIMESTAMP or
    TIMESTAMP_NTZ input (UTC session). Integer micros — never a truncating
    ``unix_timestamp`` or a lossy double — so gap comparisons agree
    bit-for-bit with DuckDB's ``epoch_us``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def epoch_seconds_d(df: DataFrame, colname: str) -> Column:
    """Epoch seconds as DOUBLE for a timestamp-typed column, pass-through
    cast for numeric epoch columns (schema-dispatched)."""
    dt = dict(df.dtypes)[colname]
    c = F.col(colname)
    if dt.startswith("timestamp"):
        return epoch_micros(c).cast("double") / F.lit(1e6)
    return c.cast("double")


def as_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Normalize ``ts_col`` to TIMESTAMP so ``withWatermark`` accepts it.
    No-op when already TIMESTAMP; NTZ is relabeled under the pinned-UTC
    session timezone."""
    if dict(df.dtypes)[ts_col] == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df
