"""Round-10 probe: time + job/stage-count the streaming maintenance
family (and any --only list) with the bench methodology (noop sink,
cold pass + min of 3 warm), plus the Spark status tracker's job/stage
deltas per pass — the robust_scaling_mad treatment's measuring stick.

Usage: python tools/maint_probe.py [--only a,b] [--sf DIR] [--rounds N]
Prints one line per (query, pass) and a summary table.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))

DEFAULT = [
    "streaming_quantile_maintenance",
    "streaming_ccf_maintenance",
    "streaming_ab_moments_maintenance",
    "streaming_ab_msprt_maintenance",
    "streaming_heavy_hitters_cms",
    "streaming_bitmap_distinct_maintenance",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()
    names = [n for n in args.only.split(",") if n] or DEFAULT

    from datalakes_and_data_integration_spark import plans
    from datalakes_and_data_integration_spark.session import get_spark

    spark = get_spark("maint_probe")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    spark.read.parquet(os.path.join(args.sf, "events.parquet")).count()

    results: dict[str, dict] = {}
    for rnd in range(args.rounds):
        for name in names:
            q = plans.QUERIES[name]
            jobs0 = len(tracker.getJobIdsForGroup(None) or [])
            sc.setJobGroup(f"probe:{name}:{rnd}", name)
            t0 = time.time()
            df = q.spark(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            njobs = len(tracker.getJobIdsForGroup(f"probe:{name}:{rnd}") or [])
            sc.setJobGroup(None, None)
            r = results.setdefault(name, {"cold": None, "warm": [], "jobs": njobs})
            if rnd == 0:
                r["cold"] = dt
            else:
                r["warm"].append(dt)
            r["jobs"] = njobs
            print(f"pass {rnd} {name}: {dt}s jobs={njobs}", flush=True)
            _ = jobs0

    print("\n| query | cold s | warm min s | jobs/run |")
    print("|---|---|---|---|")
    for name, r in results.items():
        wm = min(r["warm"]) if r["warm"] else -1
        print(f"| {name} | {r['cold']} | {wm} | {r['jobs']} |")


if __name__ == "__main__":
    main()
