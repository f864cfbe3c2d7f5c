"""Streaming-family decade probe (round-6 third session).

Fifth member of the ladder-probe family: the Structured Streaming
surface (watermarked aggregates, streaming dedup, stream-stream joins,
stateful sessions, applyInPandasWithState alerts), measured at two
decades over the same tiled-events corpus as events_ladder_probe.py
(100k events as-is, 10x tiled 1m — more users, same time range).

Every laddered query runs its stream to completion with
Trigger.AvailableNow into a memory sink (the registry form), so the
timed wall-clock IS the streaming execution: source listing +
micro-batch planning + state-store updates + sink write. What scales
10x here is per-key state count (users/sessions/dedup keys), while the
watermark horizon and time grid stay fixed — the state-store shape a
real deployment grows along.

``streaming_static_enrich`` is excluded (it joins a static dimension;
tiled user_ids have no dimension rows — that would change join
semantics rather than scale them). ``streaming_incremental_dedup``
streams the DOCUMENTS table — ladder it with the documents tiling:
    python tools/dedup_ladder_probe.py --only streaming_incremental_dedup

Usage: python tools/streaming_ladder_probe.py [--skip-1m] [--only a,b]
Prints a markdown table (BASELINE.md format) plus one JSON line.
"""

from __future__ import annotations

import os
import sys

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)

from _ladder_common import probe_main  # noqa: E402
from events_ladder_probe import build_tiled_events  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Ordered cheap->heavy: stateless-ish aggregates, then watermarked
# dedup/session state, then the stream-stream joins (two sources, state
# on both sides), then the applyInPandasWithState tiers.
LADDER = [
    "streaming_hourly_agg",
    "streaming_sliding_agg",
    "streaming_quality_report",
    "streaming_threshold_alerts",
    "streaming_dedup_first_event",
    "streaming_dedup_within_watermark",
    "streaming_stateful_sessions",
    "streaming_stream_stream_join",
    "streaming_stream_stream_left_join",
    "streaming_cusum_alerts",
    "streaming_cusum_changepoint",
]


def main() -> None:
    probe_main(
        metric="streaming_ladder_probe",
        ladder=LADDER,
        base_label="100k",
        tiled_label="1m",
        sf_dir=SF_DIR,
        build_tiled=build_tiled_events,
        tempdir_prefix="stream_probe_1m_",
        default_runs=3,
        corpus_noun="events",
    )


if __name__ == "__main__":
    main()
