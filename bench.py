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


def _cpu_calibration() -> float:
    """Seconds for a fixed pure-python loop — a host-speed anchor.

    Host throughput on this box swings >2x between runs of UNTOUCHED
    queries (see NOTES.md "Host-speed variance"); comparing BENCH_r{N}
    totals without normalizing by this anchor misreads noise as
    regression. Typical fast-host value ~0.55 s.
    """
    t0 = time.time()
    s = 0
    for i in range(10_000_000):
        s += i * i
    return round(time.time() - t0, 3)


def _cpu_calibration_parallel(n: int = 16) -> float:
    """Wall seconds for ``n`` concurrent half-size burn loops.

    The single-thread anchor misses the second throttling mode this box
    exhibits: single-thread speed stays normal while MULTI-core throughput
    collapses (measured: bench totals 16 s -> 90 s with load avg ~1 and a
    fast serial calib). Near `0.3 * (serial/0.55)` s means full parallelism;
    several-fold higher means the window was core-throttled and the Spark
    numbers in this JSON under-measure the engine.
    """
    import multiprocessing as mp

    try:
        with mp.Pool(n) as pool:
            t0 = time.time()
            pool.map(_burn_half, range(n))
            return round(time.time() - t0, 3)
    except Exception:
        return -1.0


def _burn_half(_arg: int) -> int:
    s = 0
    for i in range(5_000_000):
        s += i * i
    return s


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from datalakes_and_data_integration_spark import plans
    from datalakes_and_data_integration_spark.session import get_spark

    spark = get_spark("bench")
    # Warm the JVM/IO path once so per-query numbers measure the engine.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    # Session-wide one-time costs (first shuffle stage, broadcast/exchange
    # machinery, JIT warmup of shared codegen fragments) otherwise bill to
    # whichever query runs first: r2's registry reorder moved dedup_exact
    # into slot 0 and its warm number 2.6x'd with byte-identical code
    # (VERDICT r2 perf note). Run slot 0's query once UNTIMED so every
    # timed query starts from the same machinery-warm state.
    _first = next((q for q in plans.QUERIES.values() if q.bench), None)
    if _first is not None:
        _first.spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    # Three runs per query: run 0 pays one-time costs (Janino codegen compile
    # of the large generated expressions, parquet footer reads — measured
    # 7.4s of dedup_minhash_lsh's 8.4s cold time) and is reported as "cold";
    # the headline steady-state number is the best of runs 1-2. min-of-2
    # because this host's throughput swings 20%+ WITHIN a bench run (see
    # NOTES.md "Host-speed variance" and the two calibration anchors): a
    # single warm sample conflates engine time with whichever throttling
    # window it landed in, while the min converges on the engine's actual
    # steady-state throughput.
    times: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name, q in plans.QUERIES.items():
        if not q.bench:
            continue
        warm: list[float] = []
        for run in range(3):
            t0 = time.time()
            df = q.spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            elapsed = round(time.time() - t0, 3)
            if run == 0:
                cold[name] = elapsed
            else:
                warm.append(elapsed)
        times[name] = min(warm)

    out = {
        "metric": "headline_queries_wall_clock",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "cold_queries": cold,
        "cold_value": round(sum(cold.values()), 3),
        "sf": sf,
        "cpu_calib_sec": _cpu_calibration(),
        "cpu_calib_par_sec": _cpu_calibration_parallel(),
    }
    print(json.dumps(out))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
