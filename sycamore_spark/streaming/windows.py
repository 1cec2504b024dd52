"""Event-time windowed aggregation (Structured Streaming).

The hypertable-style time rollup's streaming twin (batch:
``__spark_entry__.q_time_bucket``; the reference has no streaming runtime —
SURVEY.md §2.11 scale headroom): tumbling or sliding event-time windows
with a late-data watermark.

Scale shape: state is bounded by (windows inside the watermark horizon) x
(distinct keys) — expired windows are finalized and dropped, so an
unbounded feed holds O(horizon) state, never O(stream). The aggregation
itself is the same partial-agg + shuffle plan Catalyst builds for a batch
groupBy; Structured Streaming adds the state store and watermark bookkeeping.

``windowed_agg`` works on BOTH batch and streaming frames (``F.window`` is
engine-agnostic): the gate query replays a parquet table through
``readStream`` and hash-checks the result against a plain SQL GROUP BY —
the batch/stream consistency contract.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_agg(
    events: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    keys: Sequence[str] = (),
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """Group ``events`` into event-time windows (tumbling, or sliding when
    ``slide`` is given) per ``keys`` and apply ``aggs`` (default: row count
    as ``n``). Late rows beyond ``watermark`` are dropped and their window
    state released. Output carries the window struct as ``win`` (access
    ``win.start`` / ``win.end``)."""
    from sycamore_spark.functions.time import as_event_time

    out = as_event_time(events, ts_col)  # watermark/window reject TIMESTAMP_NTZ
    if events.isStreaming:
        out = out.withWatermark(ts_col, watermark)
    win = (
        F.window(F.col(ts_col), window_duration, slide)
        if slide
        else F.window(F.col(ts_col), window_duration)
    )
    agg_list = list(aggs) if aggs else [F.count(F.lit(1)).alias("n")]
    return out.groupBy(win.alias("win"), *[F.col(k) for k in keys]).agg(*agg_list)
