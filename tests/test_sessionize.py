"""Sessionization: batch window-function path + stateful streaming path
(streaming/sessionize.py)."""

import datetime as dt
import tempfile

import pytest
from pyspark.sql import functions as F

from sycamore_spark.streaming.sessionize import sessionize_batch, sessionize_stream


def ts(minute):
    return dt.datetime(2026, 1, 1, 10, minute)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        (1, ts(0), "a"),
        (1, ts(5), "b"),      # same session (gap 5m < 30m)
        (1, ts(50), "c"),     # new session (45m gap)
        (2, ts(1), "d"),
        (2, ts(45), "e"),     # new session for user 2
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, payload string")


def test_sessionize_batch(spark, events):
    out = sessionize_batch(events, gap_seconds=1800)
    got = {r["payload"]: r["session_id"] for r in out.collect()}
    assert got == {"a": "1-1", "b": "1-1", "c": "1-2", "d": "2-1", "e": "2-2"}


def test_sessionize_batch_single_shuffle(spark, events):
    plan = sessionize_batch(events, gap_seconds=1800)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


class _FakeState:
    """Minimal GroupState stand-in for unit-testing the stateful fn contract."""

    def __init__(self, timed_out=False, existing=None, watermark_ms=0):
        self.hasTimedOut = timed_out
        self._val = existing
        self.removed = False
        self.timeout_ms = None
        self._wm = watermark_ms

    @property
    def exists(self):
        return self._val is not None

    @property
    def get(self):
        return self._val

    def update(self, v):
        self._val = v

    def remove(self):
        self.removed = True
        self._val = None

    def getCurrentWatermarkMs(self):
        return self._wm

    def setTimeoutTimestamp(self, ms):
        if ms <= self._wm:
            raise ValueError(f"timeout {ms} <= watermark {self._wm}")
        self.timeout_ms = ms


def test_stream_fn_timeout_removes_state():
    """On event-time timeout the fn must drop state and emit nothing —
    re-arming a timeout <= the firing watermark would crash the stream."""
    from sycamore_spark.streaming.sessionize import _session_fn_factory

    fn = _session_fn_factory("user_id", "ts", 1800, ["user_id", "ts", "payload", "session_id"])
    state = _FakeState(timed_out=True, existing=(1000, 3), watermark_ms=10_000_000)
    out = list(fn((1,), iter([]), state))
    assert out == []
    assert state.removed
    assert state.timeout_ms is None


def test_stream_fn_timeout_after_watermark():
    """Late-arriving events whose last_ts+gap is already behind the watermark
    must still arm a timeout strictly in the future."""
    import pandas as pd

    from sycamore_spark.streaming.sessionize import _session_fn_factory

    fn = _session_fn_factory("user_id", "ts", 1800, ["user_id", "ts", "payload", "session_id"])
    wm_ms = 3 * 10**12  # ~2065 in epoch-ms: far ahead of the event times below
    state = _FakeState(watermark_ms=wm_ms)
    pdf = pd.DataFrame({"user_id": [1], "ts": [pd.Timestamp(ts(0))], "payload": ["a"]})
    out = list(fn((1,), iter([pdf]), state))
    assert len(out) == 1 and out[0]["session_id"].tolist() == ["1-1"]
    assert state.timeout_ms == wm_ms + 1


def test_sessionize_stream(spark, events, tmp_path):
    src = str(tmp_path / "src")
    events.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    sessions = sessionize_stream(stream, gap_seconds=1800, watermark="10 minutes")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["payload"]: r["session_id"] for r in spark.sql("select * from sess_out").collect()}
    assert got == {"a": "1-1", "b": "1-1", "c": "1-2", "d": "2-1", "e": "2-2"}


def test_sessionize_stream_multibatch_timeout(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1): the watermark from batch 2
    fires the event-time timeout for batch-1 users — the hasTimedOut path
    (state removal, no emission) must not crash the stream and every row
    still gets its session id."""
    import datetime as dt

    src = str(tmp_path / "src_mb")
    schema = "user_id long, ts timestamp, payload string"
    batch1 = spark.createDataFrame(
        [(1, dt.datetime(2026, 1, 1, 10, 0), "a"), (2, dt.datetime(2026, 1, 1, 10, 1), "d")],
        schema,
    )
    # user 2 is idle in batch 2; its last_ts+gap is far behind this watermark
    batch2 = spark.createDataFrame(
        [(1, dt.datetime(2026, 1, 1, 14, 0), "b"), (3, dt.datetime(2026, 1, 1, 14, 1), "e")],
        schema,
    )
    batch1.coalesce(1).write.mode("overwrite").parquet(src + "/b1")
    batch2.coalesce(1).write.mode("overwrite").parquet(src + "/b2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    sessions = sessionize_stream(stream, gap_seconds=1800, watermark="1 minute")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_mb")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    got = {r["payload"]: r["session_id"] for r in spark.sql("select * from sess_mb").collect()}
    # user 1: 4h gap -> second session; users 2/3 single sessions
    assert got["a"] == "1-1" and got["d"] == "2-1" and got["e"] == "3-1"
    assert got["b"] in ("1-1", "1-2")  # 1-2 when batches split; state timing may vary
