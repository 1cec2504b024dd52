"""Gap-based sessionization: batch and stateful-streaming implementations.

The reference has no streaming runtime (SURVEY.md §2.11) — this is scale
headroom for the events/training-data pipeline, built on Structured
Streaming per the Spark-first mandate.

- Batch: pure window functions — a session starts where the gap from the
  previous event of the same user exceeds ``gap``; session_id = running sum
  of starts (one shuffle on user_id, no Python).
- Streaming: ``applyInPandasWithState`` keeps (last_ts, session_no,
  session_start) per user with an event-time timeout, emitting rows tagged
  with their session as they arrive. State is O(users), not O(events).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)
from pyspark.sql.window import Window


def sessionize_batch(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    out_col: str = "session_id",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assign ``<user>-<n>`` session ids. One hash shuffle on the user key;
    both window passes share the same (user, ts) ordering so Spark sorts
    once. Pass ``tiebreak_col`` for a deterministic order under equal
    timestamps."""
    from sycamore_spark.functions.time import epoch_micros

    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    # Exact integer-microsecond gap (NTZ-safe): TIMESTAMP_NTZ can't cast to
    # long, unix_timestamp truncates sub-second parts, and the oracle
    # (epoch_us) keeps them — integer micros agree with DuckDB bit-for-bit.
    ts_us = epoch_micros(F.col(ts_col))
    prev_us = F.lag(ts_us).over(w)
    is_start = (
        prev_us.isNull() | (ts_us - prev_us > gap_seconds * 1_000_000)
    ).cast("int")
    session_no = F.sum(is_start).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.withColumn(
        out_col, F.concat(F.col(user_col).cast("string"), F.lit("-"), session_no.cast("string"))
    )


_STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType()),
        StructField("session_no", IntegerType()),
    ]
)


def _session_fn_factory(user_col: str, ts_col: str, gap_seconds: int, out_fields: list[str]):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            # Event-time timeout: the user has been idle past the gap — drop
            # the state (the session is closed; a later event would start a
            # new one anyway) and emit nothing. Re-arming a timeout here
            # would set a timestamp <= the watermark that fired it, which
            # Spark rejects.
            state.remove()
            return
        if state.exists:
            last_ts, session_no = state.get
        else:
            last_ts, session_no = None, 0
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for row in pdf.to_dict("records"):
                # microseconds, not seconds: sub-second gap boundaries must
                # match the batch path's exact integer-micros comparison
                ts = int(pd.Timestamp(row[ts_col]).value // 1_000)
                if last_ts is None or ts - last_ts > gap_seconds * 1_000_000:
                    session_no += 1
                last_ts = ts
                row["session_id"] = f"{user}-{session_no}"
                out.append(row)
        if last_ts is not None:
            state.update((last_ts, session_no))
            # Strictly after the current watermark, else Spark rejects it:
            # the batch's watermark can already have advanced past
            # last_ts + gap when this user's events arrived late.
            timeout_ms = last_ts // 1000 + gap_seconds * 1000
            wm_ms = state.getCurrentWatermarkMs()
            if timeout_ms <= wm_ms:
                timeout_ms = wm_ms + 1
            state.setTimeoutTimestamp(timeout_ms)
        if out:
            yield pd.DataFrame(out)[out_fields]

    return fn


def sessionize_stream(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization over a streaming DataFrame: per-user state
    (last event time + session counter) via applyInPandasWithState with an
    event-time timeout one gap after the last event, so idle users' state
    is dropped instead of accumulating forever."""
    from pyspark.sql.types import StringType

    from sycamore_spark.functions.time import as_event_time

    events = as_event_time(events, ts_col)  # watermark rejects TIMESTAMP_NTZ
    out_schema = StructType(list(events.schema.fields) + [StructField("session_id", StringType())])
    out_fields = [f.name for f in out_schema.fields]
    fn = _session_fn_factory(user_col, ts_col, gap_seconds, out_fields)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
