"""Events/temporal-family decade probe (round-6 second session).

Third member of the ladder-probe family (ANN: ann_ladder_probe.py;
documents: dedup_ladder_probe.py): the temporal / sessionization /
window-function surface over ``events``, measured at two decades:

- sf0.1 as-is: 100,000 events
- a 10x tiled copy: 1,000,000 events

Tiling models how a 10x deployment actually grows — MORE USERS in the
SAME time range: copy c>0 offsets user_id and event_id by c*stride and
keeps ts/event_type/value/props verbatim. Per-user window shapes
(sessions, sequences, retention transitions) are preserved exactly;
per-timestamp group cardinality grows 10x; the time grid (gap-fill
output, hourly buckets) stays fixed.

Only pure-events queries are laddered — queries that join events to the
customer dimension (dau_by_nation, salted_join_user_profile,
skew_salted_join_stats) are excluded because tiled user_ids have no
dimension rows, which would silently change join semantics rather than
scale them.

Usage: python tools/events_ladder_probe.py [--skip-1m] [--only a,b]
Prints a markdown table (BASELINE.md format) plus one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TILE = 10

# Ordered cheap->heavy; every entry reads ONLY the events table.
LADDER = [
    "tumbling_hourly_agg",
    "rolling_1h_value_sum",
    "sessionization",
    "session_window_native",
    "event_transition_matrix",
    "event_sequence_pattern",
    "asof_join_last_click",
    "conversion_latency_quantiles",
    "range_join_views_before_purchase",
    "dau_new_returning_resurrected",
    "session_bounce_rate_daily",
    "gapfill_hourly_interpolate",
    "json_props_extract",
    "cusum_changepoint",
    "robust_scaling_mad",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def build_tiled_events(src_dir: str, out_dir: str, tile: int) -> int:
    """Write a tile-x events.parquet (new users, same time range);
    symlink every other table."""
    t = pq.read_table(os.path.join(src_dir, "events.parquet"))
    eids = t.column("event_id").to_numpy()
    uids = t.column("user_id").to_numpy()
    e_stride = int(eids.max()) + 1
    u_stride = int(uids.max()) + 1
    parts = []
    for c in range(tile):
        parts.append(
            pa.table(
                {
                    "event_id": pa.array(eids + c * e_stride, pa.int64()),
                    "ts": t.column("ts"),
                    "user_id": pa.array(uids + c * u_stride, pa.int64()),
                    "event_type": t.column("event_type"),
                    "value": t.column("value"),
                    "props": t.column("props"),
                }
            )
        )
    pq.write_table(
        pa.concat_tables(parts), os.path.join(out_dir, "events.parquet")
    )
    for name in TABLES:
        if name == "events":
            continue
        src = os.path.join(src_dir, f"{name}.parquet")
        if os.path.exists(src):
            os.symlink(src, os.path.join(out_dir, f"{name}.parquet"))
    return t.num_rows * tile


def run_one(spark, name: str, sf_dir: str, runs: int) -> tuple[float, int]:
    """Timed runs go through the noop sink, same as bench.py — count()
    would let Catalyst PRUNE unused projection/window work (rolling
    sums, gap-fill interpolation, session ids), silently understating
    the window tiers this probe exists to measure. The row count runs
    once, untimed."""
    from datalakes_and_data_integration_spark.plans import QUERIES

    fn = QUERIES[name].spark
    times = []
    for i in range(runs):
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        if i > 0 or runs == 1:
            times.append(dt)
    rows = fn(spark, sf_dir).count()
    return min(times), rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-1m", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma-separated query subset")
    ap.add_argument("--runs", type=int, default=2,
                    help="runs per cell (first is warmup unless runs=1)")
    args = ap.parse_args()
    if args.runs < 1:
        ap.error("--runs must be >= 1")
    only = set(args.only.split(",")) if args.only else None

    from datalakes_and_data_integration_spark.session import get_spark

    spark = get_spark()

    decades = [("100k", SF_DIR)]
    if not args.skip_1m:
        tiled = tempfile.mkdtemp(prefix="events_probe_1m_")
        n = build_tiled_events(SF_DIR, tiled, TILE)
        print(f"# tiled corpus: {n} events at {tiled}")
        decades.append(("1m", tiled))

    out: dict[str, dict] = {}
    for decade, d in decades:
        for name in LADDER:
            if only is not None and name not in only:
                continue
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
    for name in LADDER:
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
    print(json.dumps({"metric": "events_ladder_probe", "results": out}))


if __name__ == "__main__":
    main()
