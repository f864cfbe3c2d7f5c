"""Benchmark harness (driver contract).

Runs the bench-flagged headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <float>}

Each query is forced end-to-end with a noop sink (full evaluation, no
driver collect, no output cost) — the number is the engine's time, not
serialization's.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from datalakes_and_data_integration_spark import plans
    from datalakes_and_data_integration_spark.session import get_spark

    spark = get_spark("bench")
    # Warm the JVM/IO path once so per-query numbers measure the engine.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    times: dict[str, float] = {}
    for name, q in plans.QUERIES.items():
        if not q.bench:
            continue
        t0 = time.time()
        df = q.spark(spark, sf_dir)
        if df.isStreaming:  # pragma: no cover - bench set is batch-only
            df = df
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)

    out = {
        "metric": "headline_queries_wall_clock",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    print(json.dumps(out))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
