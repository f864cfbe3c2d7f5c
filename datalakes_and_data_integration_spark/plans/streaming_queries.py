"""Structured Streaming queries, oracle-checked.

``AvailableNow`` processes the whole source in one run, so the watermarked
streaming aggregate must equal the batch SQL over the same data — which
makes the streaming path oracle-checkable, not just rows-only."""

from __future__ import annotations

from datalakes_and_data_integration_spark.plans.registry import register

# streaming imports happen inside each query function: the streaming package
# imports plans._util, so a module-level import here would be circular when
# the streaming package is imported first.


@register(
    "streaming_hourly_agg",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           count(*) AS n_events,
           CAST(ROUND(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    description="Structured Streaming file source -> watermarked 1h tumbling "
    "aggregate, run to completion with Trigger.AvailableNow; equals the "
    "batch aggregate over the same input (the oracle).",
    tags=("streaming", "window"),
)
def streaming_hourly_agg(spark, sf_dir):
    from datalakes_and_data_integration_spark.streaming import (
        events_stream,
        hourly_agg_stream,
        run_available_now,
    )

    stream = events_stream(spark, sf_dir)
    agg = hourly_agg_stream(stream)
    return run_available_now(agg, spark, name="streaming_hourly_agg_out")


@register(
    "streaming_sliding_agg",
    oracle="""
    SELECT wstart AS window_start, event_type, count(*) AS n_events,
           CAST(ROUND(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_value
    FROM (
      SELECT unnest([
               time_bucket(INTERVAL 30 MINUTE, ts),
               time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE
             ]) AS wstart,
             event_type, value
      FROM events
    )
    GROUP BY wstart, event_type
    """,
    description="1-hour window sliding every 30 minutes per event type "
    "(each event lands in exactly two windows), run to completion with "
    "Trigger.AvailableNow; the oracle expands the two window starts per "
    "event explicitly.",
    tags=("streaming", "window", "sliding"),
)
def streaming_sliding_agg(spark, sf_dir):
    from datalakes_and_data_integration_spark.streaming import (
        events_stream,
        run_available_now,
        sliding_agg_stream,
    )

    stream = events_stream(spark, sf_dir)
    return run_available_now(
        sliding_agg_stream(stream), spark, name="streaming_sliding_agg_out"
    )


@register(
    "streaming_dedup_first_event",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
    description="Streaming dropDuplicates on (user_id, event_type) within "
    "the watermark horizon — the streaming twin of the reference's LWT "
    "first-writer-wins (A2); only key columns are emitted so the result is "
    "order-independent.",
    tags=("streaming", "dedup", "parity"),
)
def streaming_dedup_first_event(spark, sf_dir):
    from datalakes_and_data_integration_spark.streaming import (
        dedup_stream,
        events_stream,
        run_available_now,
    )

    stream = events_stream(spark, sf_dir)
    return run_available_now(
        dedup_stream(stream), spark, name="streaming_dedup_out",
        output_mode="append",
    )


@register(
    "streaming_stateful_sessions",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) > 1800000
                  OR lag(epoch_ms(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), numbered AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    ), sessions AS (
      SELECT user_id, sid, min(ts) AS session_start, max(ts) AS session_end,
             count(*) AS n_events
      FROM numbered GROUP BY user_id, sid
    )
    SELECT user_id, session_start, session_end, n_events
    FROM sessions
    WHERE sid < (SELECT max(s2.sid) FROM sessions s2
                 WHERE s2.user_id = sessions.user_id)
       OR sid IS NULL
    """,
    description="Custom stateful streaming operator: gap-based (30 min) "
    "sessionization via applyInPandasWithState. Append mode emits a session "
    "only when a later event closes it, so each user's final session stays "
    "in state at end-of-stream — the oracle is all-but-the-last session per "
    "user. State is per-user, timeout-bounded (the operator class the "
    "reference cannot express, SURVEY.md 2.8).",
    tags=("streaming", "stateful", "session"),
)
def streaming_stateful_sessions(spark, sf_dir):
    from datalakes_and_data_integration_spark.streaming import (
        events_stream,
        run_available_now,
        stateful_sessions_stream,
    )

    stream = events_stream(spark, sf_dir)
    return run_available_now(
        stateful_sessions_stream(stream),
        spark,
        name="streaming_stateful_sessions_out",
        output_mode="append",
    )


@register(
    "streaming_stream_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           c.event_id AS click_id, c.ts AS click_ts
    FROM events p
    JOIN events c
      ON c.user_id = p.user_id AND c.event_type = 'click'
      AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts < p.ts
    WHERE p.event_type = 'purchase'
    """,
    description="Stream-stream interval join: purchases x same-user clicks "
    "in the preceding 30 minutes, both sides watermarked (bounded join "
    "state), run to completion with Trigger.AvailableNow; equals the batch "
    "interval join (the oracle).",
    tags=("streaming", "stream-stream-join", "temporal"),
)
def streaming_stream_stream_join(spark, sf_dir):
    from datalakes_and_data_integration_spark.streaming import (
        events_stream,
        run_available_now,
    )
    from datalakes_and_data_integration_spark.streaming.file_stream import (
        purchases_with_recent_click_stream,
    )

    stream = events_stream(spark, sf_dir)
    return run_available_now(
        purchases_with_recent_click_stream(stream),
        spark,
        name="streaming_ssj_out",
        output_mode="append",
    )
