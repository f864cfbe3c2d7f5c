"""Structured Streaming queries, oracle-checked.

``AvailableNow`` processes the whole source in one run, so the watermarked
streaming aggregate must equal the batch SQL over the same data — which
makes the streaming path oracle-checkable, not just rows-only."""

from __future__ import annotations

from datalakes_and_data_integration_spark.plans.registry import register
from datalakes_and_data_integration_spark.streaming import (
    events_stream,
    hourly_agg_stream,
    run_available_now,
)


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
    stream = events_stream(spark, sf_dir)
    agg = hourly_agg_stream(stream)
    return run_available_now(agg, spark, name="streaming_hourly_agg_out")
