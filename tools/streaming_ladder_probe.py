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

import argparse
import json
import os
import sys
import tempfile

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)

from events_ladder_probe import build_tiled_events, run_one  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TILE = 10

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
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-1m", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma-separated query subset (any registry "
                    "names, ordered; not limited to the default LADDER)")
    ap.add_argument("--runs", type=int, default=3,
                    help="runs per cell (first is warmup unless runs=1)")
    args = ap.parse_args()
    if args.runs < 1:
        ap.error("--runs must be >= 1")
    ladder = args.only.split(",") if args.only else LADDER

    from datalakes_and_data_integration_spark.session import get_spark

    spark = get_spark()

    decades = [("100k", SF_DIR)]
    if not args.skip_1m:
        tiled = tempfile.mkdtemp(prefix="stream_probe_1m_")
        n = build_tiled_events(SF_DIR, tiled, TILE)
        print(f"# tiled corpus: {n} events at {tiled}")
        decades.append(("1m", tiled))

    out: dict[str, dict] = {}
    for decade, d in decades:
        for name in ladder:
            try:
                t, rows = run_one(spark, name, d, runs=args.runs)
            except Exception as exc:  # keep the sweep going
                print(f"# {decade} {name}: ERR {exc}", flush=True)
                continue
            out.setdefault(name, {})[decade] = {
                "sec": round(t, 2), "rows": rows,
            }
            print(f"# {decade} {name}: {t:.2f}s rows={rows}", flush=True)

    print("\n| query | 100k warm s | 100k rows | 1m warm s | 1m rows "
          "| time ratio |")
    print("|---|---|---|---|---|---|")
    for name in ladder:
        if name not in out:
            continue
        r1 = out[name].get("100k", {})
        r10 = out[name].get("1m", {})
        ratio = (
            round(r10["sec"] / r1["sec"], 1)
            if r1.get("sec") and r10.get("sec")
            else None
        )

        def cell(d, k):
            v = d.get(k)
            return "—" if v is None else v

        print(
            f"| {name} | {cell(r1, 'sec')} | {cell(r1, 'rows')} | "
            f"{cell(r10, 'sec')} | {cell(r10, 'rows')} | "
            f"{ratio if ratio is not None else '—'}x |"
        )
    print(json.dumps({"metric": "streaming_ladder_probe", "results": out}))


if __name__ == "__main__":
    main()
