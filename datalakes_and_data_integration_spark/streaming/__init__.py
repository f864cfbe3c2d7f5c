"""Structured Streaming variants of the batch operators.

The reference is batch-only on a daily schedule (SURVEY.md §2.8); its
implicit late-data handling (re-fetch last 3 days + idempotent dedup) maps
to a file-source stream with watermarked windows and drop-duplicates here.
"""

from datalakes_and_data_integration_spark.streaming.file_stream import (
    dedup_stream,
    events_stream,
    hourly_agg_stream,
    run_available_now,
    sliding_agg_stream,
    stateful_sessions_stream,
    static_enriched_stream,
)
from datalakes_and_data_integration_spark.streaming.incremental_dedup import (
    incremental_minhash_dedup,
    minhash_bands,
)

__all__ = [
    "incremental_minhash_dedup",
    "minhash_bands",
    "dedup_stream",
    "events_stream",
    "hourly_agg_stream",
    "run_available_now",
    "sliding_agg_stream",
    "stateful_sessions_stream",
    "static_enriched_stream",
]
