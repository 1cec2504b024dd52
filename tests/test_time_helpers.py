"""NTZ-safe event-time helpers (functions/time.py) — the regression guards
for the class of failure that crashed the round-2 bench (TIMESTAMP_NTZ
cannot cast to numeric; withWatermark rejects it)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from sycamore_spark.functions.time import as_event_time, epoch_micros, epoch_seconds_d
from sycamore_spark.streaming.sessionize import sessionize_batch


@pytest.fixture(scope="module")
def ntz_events(spark):
    """Events with sub-second timestamps as TIMESTAMP_NTZ — the exact shape
    Spark 4 reads from the testdata's naive timestamp[us] parquet."""
    df = spark.createDataFrame(
        [
            (1, "2026-01-01 10:00:00.250", "a"),
            (1, "2026-01-01 10:29:59.900", "b"),   # gap 1799.65s < 1800: same session
            (1, "2026-01-01 10:59:59.901", "c"),   # gap 1800.001s > 1800: new session
            (2, "2026-01-01 10:00:00.000", "d"),
        ],
        "user_id long, raw string, payload string",
    ).withColumn("ts", F.col("raw").cast("timestamp_ntz")).drop("raw")
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    return df


def test_epoch_micros_on_ntz_matches_duckdb(spark, ntz_events):
    got = {
        r.payload: r.us
        for r in ntz_events.select("payload", epoch_micros(F.col("ts")).alias("us")).collect()
    }
    duck = dict(
        duckdb.sql(
            "SELECT payload, epoch_us(ts) FROM (VALUES "
            "('a', TIMESTAMP '2026-01-01 10:00:00.250'), "
            "('b', TIMESTAMP '2026-01-01 10:29:59.900'), "
            "('c', TIMESTAMP '2026-01-01 10:59:59.901'), "
            "('d', TIMESTAMP '2026-01-01 10:00:00.000')) t(payload, ts)"
        ).fetchall()
    )
    assert got == duck


def test_sessionize_batch_on_ntz_subsecond_gaps(spark, ntz_events):
    """NTZ input + sub-second boundary gaps: 1799.65s stays one session,
    1800.001s starts a new one — truncating seconds would get both wrong."""
    out = sessionize_batch(ntz_events, gap_seconds=1800)
    got = {r.payload: r.session_id for r in out.collect()}
    assert got == {"a": "1-1", "b": "1-1", "c": "1-2", "d": "2-1"}


def test_as_event_time_normalizes_only_ntz(spark, ntz_events):
    norm = as_event_time(ntz_events, "ts")
    assert dict(norm.dtypes)["ts"] == "timestamp"
    # idempotent on already-TIMESTAMP frames (no-op, same plan object)
    again = as_event_time(norm, "ts")
    assert dict(again.dtypes)["ts"] == "timestamp"
    # values are a pure relabel under the pinned-UTC session
    a = {r.payload: r.us for r in ntz_events.select("payload", epoch_micros(F.col("ts")).alias("us")).collect()}
    b = {r.payload: r.us for r in norm.select("payload", F.unix_micros("ts").alias("us")).collect()}
    assert a == b


def test_epoch_seconds_d_dispatches_on_type(spark):
    df = spark.createDataFrame(
        [(1.5, "2026-01-01 00:00:00.500")], "num double, raw string"
    ).withColumn("t", F.col("raw").cast("timestamp_ntz"))
    row = df.select(
        epoch_seconds_d(df, "num").alias("a"), epoch_seconds_d(df, "t").alias("b")
    ).collect()[0]
    assert row.a == 1.5
    assert row.b == 1767225600.5  # 2026-01-01 UTC + 0.5s


def test_streaming_sessionize_accepts_ntz(spark, ntz_events, tmp_path):
    """The exact r2 crash shape: NTZ event-time through withWatermark +
    applyInPandasWithState must run (availableNow drain)."""
    from sycamore_spark.streaming.sessionize import sessionize_stream

    src = str(tmp_path / "src")
    ntz_events.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = sessionize_stream(stream, gap_seconds=1800)
    q = (
        out.writeStream.format("memory").queryName("ntz_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT payload, session_id FROM ntz_sessions").collect()
    got = {r.payload: r.session_id for r in rows}
    assert got == {"a": "1-1", "b": "1-1", "c": "1-2", "d": "2-1"}

