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
