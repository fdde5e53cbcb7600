"""Event-stream operators: watermarked windows (stream == batch) and the
applyInPandasWithState sessionizer (closed sessions == batch sessions)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from wiser_spark.streaming.windows import (
    sessionize_batch,
    sessionize_streaming,
    windowed_event_counts,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _events(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for user in range(3):
        # two sessions per user: a burst, a >30min gap, another burst
        for s, start_min in enumerate((0, 90)):
            for k in range(4):
                rows.append(
                    (eid, base + dt.timedelta(minutes=start_min + k * 5 + user),
                     user, "click" if k % 2 else "view", float(k + user))
                )
                eid += 1
    return spark.createDataFrame(rows, SCHEMA)


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    events = _events(spark)
    events.write.parquet(str(tmp_path / "in"))
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(events).collect()
    }
    stream = spark.readStream.schema(events.schema).parquet(str(tmp_path / "in"))
    q = (
        windowed_event_counts(stream, watermark="1 hour")
        .writeStream.format("memory").queryName("winagg")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from winagg").collect()
    }
    assert got == batch


def test_stateful_sessionizer_matches_batch_closed_sessions(spark, tmp_path):
    events = _events(spark)
    events.write.parquet(str(tmp_path / "in"))
    want = {
        (r["user_id"], r["session_id"]): (r["n_events"], round(r["sum_value"], 6))
        for r in sessionize_batch(events, gap_minutes=30).collect()
    }
    stream = spark.readStream.schema(events.schema).parquet(str(tmp_path / "in"))
    q = (
        sessionize_streaming(stream, gap_minutes=30)
        .writeStream.format("memory").queryName("sessions")
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt")).start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], round(r["sum_value"], 6))
        for r in spark.sql("select * from sessions").collect()
    }
    # the stream emits only CLOSED sessions (the final open session per
    # user stays in state until the watermark passes it) — emitted ones
    # must match the batch answer
    assert len(got) >= 3  # session 0 closed for each user
    for key, v in got.items():
        assert want[key] == v


def test_sliding_windows_double_count(spark):
    """10-min windows sliding by 5: every event lands in exactly two
    windows, so total counted events = 2x the tumbling total."""
    events = _events(spark)
    tumb = windowed_event_counts(events, window="10 minutes")
    slid = windowed_event_counts(events, window="10 minutes", slide="5 minutes")
    n_t = sum(r["n_events"] for r in tumb.collect())
    n_s = sum(r["n_events"] for r in slid.collect())
    assert n_s == 2 * n_t == 2 * events.count()


def test_idle_session_flushed_by_event_time_timeout(spark, tmp_path):
    """A lone trailing session must be emitted WITHOUT a successor event
    from the same user: the event-time timeout closes it once the
    watermark (advanced by OTHER users' events) passes end + gap."""
    base = dt.datetime(2024, 1, 1)
    early = [
        (i, base + dt.timedelta(minutes=5 * i), 0, "view", 1.0)
        for i in range(3)
    ]  # user 0: one burst, then silence forever
    late = [(99, base + dt.timedelta(minutes=300), 1, "view", 2.0)]
    in_dir = tmp_path / "in"
    spark.createDataFrame(early, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    spark.createDataFrame(late, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    q = (
        sessionize_streaming(stream, gap_minutes=30)
        .writeStream.format("memory").queryName("idle_sessions")
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt")).start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_id"]): r["n_events"]
        for r in spark.sql("select * from idle_sessions").collect()
    }
    assert got.get((0, 0)) == 3, got  # flushed by timeout, not by an event
