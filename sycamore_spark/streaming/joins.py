"""Stream-stream event-time joins (Structured Streaming).

Attribution-style pairing (click -> purchase within an hour) as a
watermarked stream-stream interval join — the canonical stateful streaming
operator Spark provides that the reference's batch-only runtime cannot
express (SURVEY.md §2.11 scale headroom).

Scale shape: each side buffers only rows inside ``watermark + max_delay``
of event time — the state store holds O(horizon x key cardinality), never
O(stream). The join itself is the same hash exchange on the key Catalyst
plans for batch; Structured Streaming adds buffering and state eviction
driven by the time-range condition.

``interval_join_streams`` works on BOTH batch and streaming frames (the
join condition is engine-agnostic), so the gate query replays a parquet
table through ``readStream`` and hash-checks against the equivalent batch
SQL — the batch/stream consistency contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join ``right`` rows to same-``key`` ``left`` rows whose timestamp
    precedes them by at most ``max_delay``:

        right.right_ts BETWEEN left.left_ts AND left.left_ts + max_delay

    On streaming inputs both sides get the event-time ``watermark`` (the
    time-range condition then bounds each side's join state). ``left_ts``
    and ``right_ts`` must be distinct column names (pre-alias if joining a
    stream to itself).
    """
    from sycamore_spark.functions.time import as_event_time

    lf = as_event_time(left, left_ts)
    rf = as_event_time(right, right_ts)
    if lf.isStreaming:
        lf = lf.withWatermark(left_ts, watermark)
    if rf.isStreaming:
        rf = rf.withWatermark(right_ts, watermark)
    cond = (
        (lf[key] == rf[key])
        & (rf[right_ts] >= lf[left_ts])
        & (rf[right_ts] <= lf[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    return lf.join(rf, cond, how).drop(rf[key])
