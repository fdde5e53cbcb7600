"""Streaming event analytics: watermarked windowed aggregation and a
custom stateful sessionizer.

Beyond the reference's batch-only scope: the training-pipeline side of
this engine consumes event streams (ingest logs, pipeline telemetry), so
the standard Structured Streaming shapes are provided as operators over
the ``events`` schema (event_id, ts, user_id, event_type, value, props):

  windowed_event_counts   tumbling event-time windows + watermark for
                          late data -> (window, event_type, n, sum_value)
  sessionize              applyInPandasWithState: per-user sessions split
                          on a gap timeout (the custom-stateful-operator
                          shape the reference has no analogue for)

Both also run in BATCH mode (same code path over a static DataFrame for
the windowed agg; tested that streaming == batch on the same input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    streaming: bool | None = None,
    slide: str | None = None,
) -> DataFrame:
    """(window_start, window_end, event_type, n_events, sum_value).

    Tumbling by default; pass ``slide`` for SLIDING windows (each event
    contributes to window_len/slide overlapping windows, epoch-aligned
    like Spark's window()). With a streaming input, the watermark bounds
    state for late events; on a batch input the same aggregation runs
    without one.
    """
    src = events
    if streaming if streaming is not None else events.isStreaming:
        src = events.withWatermark("ts", watermark)
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    out = (
        src.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n_events", "sum_value",
        )
    )
    return out


SESSION_SCHEMA = (
    "user_id long, session_id int, n_events int, "
    "session_start timestamp, session_end timestamp, sum_value double"
)


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions, batch formulation (pure window functions):
    a new session starts when the user's inter-event gap exceeds the
    timeout. The streaming twin below keeps per-user state instead."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    # TIMESTAMP_NTZ can't cast straight to long; go via timestamp_ltz
    # (session tz is UTC here; the subtraction cancels any offset anyway)
    ts_s = F.col("ts").cast("timestamp_ltz").cast("long")
    gap = ts_s - F.lag(ts_s).over(w)
    marked = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    ).withColumn("session_id", F.sum("new_session").over(w).cast("int") - 1)
    return marked.groupBy("user_id", "session_id").agg(
        F.count("*").cast("int").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


def sessionize_streaming(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "0 seconds"
):
    """applyInPandasWithState sessionizer: per-user state holds the open
    session. A session is emitted when a later event of the SAME user
    exceeds the gap, OR when the event-time watermark passes
    session_end + gap (EventTimeTimeout) — so an idle user's final
    session is flushed by the stream itself, without waiting for that
    user to ever act again. Returns a streaming DataFrame."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_s = gap_minutes * 60
    cols = ["user_id", "session_id", "n_events",
            "session_start", "session_end", "sum_value"]

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            # watermark passed session_end + gap: the session can never
            # be extended (later events would be late beyond watermark)
            sid, n, start, end, sv = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, sid, n, start, end, round(sv, 6))], columns=cols
            ).astype({"session_start": "datetime64[s]",
                      "session_end": "datetime64[s]"})
            return
        rows = pd.concat(list(pdfs)).sort_values("ts")
        if state.exists:
            sid, n, start, end, sv = state.get
        else:
            sid, n, start, end, sv = -1, 0, None, None, 0.0
        out = []
        for ts, value in zip(rows["ts"], rows["value"]):
            t = ts.timestamp()
            if start is None or t - end > gap_s:
                if start is not None:
                    out.append((user_id, sid, n, start, end, round(sv, 6)))
                sid, n, start, end, sv = sid + 1, 0, t, t, 0.0
            n += 1
            end = t
            sv += float(value)
        state.update((sid, n, start, end, sv))
        # close the open session once event time moves past end + gap
        state.setTimeoutTimestamp(int((end + gap_s) * 1000))
        if out:
            yield pd.DataFrame(out, columns=cols).astype(
                {"session_start": "datetime64[s]",
                 "session_end": "datetime64[s]"}
            )

    return events.withWatermark("ts", watermark).groupBy(
        "user_id"
    ).applyInPandasWithState(
        fn, SESSION_SCHEMA,
        "sid int, n int, start double, end double, sv double",
        "append", GroupStateTimeout.EventTimeTimeout,
    )
