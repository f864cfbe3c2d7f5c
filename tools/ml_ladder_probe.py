"""ML/embedding-family decade probe (round-6 third session).

Sixth member of the ladder-probe family: the NON-top-k embedding
surface — near-dup tiers, label/centroid analytics, covariance
spectrum, and the logistic-regression training/eval suite — measured at
the same two decades as the ANN ladder (sf0.1's 2,000 vectors as-is, a
10x tiled 20,000-vector copy built by ann_ladder_probe's tiling: copy
c>0 offsets vec_id, keeps labels, adds seeded 2%-of-std Gaussian
noise).

What scales 10x: corpus rows for the scan/aggregate tiers, candidate
sets for the bucketed near-dup tiers, and per-iteration gradient scans
for the GD suite (dim-sized state throughout). A candidate blowup, a
lost broadcast, or a collapse onto one partition shows as a 10x+ ratio
or an absolute blowup; dim-bounded work should be flat.

Usage: python tools/ml_ladder_probe.py [--skip-20k] [--only a,b]
Prints a markdown table (BASELINE.md format) plus one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)

from ann_ladder_probe import build_tiled_corpus  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TILE = 10

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Ordered cheap->heavy: profiling scans, dim-sized label analytics,
# spectrum, quantization/projection, eval suites, the GD training
# tiers, then the bucketed near-dup pair tiers.
LADDER = [
    "embedding_norm_stats",
    "label_centroids",
    "label_centroid_distances",
    "label_cov_moments",
    "label_cov_power_iteration",
    "embedding_random_projection",
    "embedding_quantization_error",
    "balanced_batch_assignment",
    "centroid_classifier_eval",
    "ann_label_mrr",
    "knn_classifier_eval",
    "logreg_gd_weights",
    "logreg_confusion",
    "logreg_holdout_eval",
    "logreg_calibration_bins",
    "logreg_multihead_weights",
    "ann_hard_negatives",
    "embedding_near_dup",
    "embedding_near_dup_hybrid",
]


def build_decade(src_dir: str, out_dir: str, tile: int) -> int:
    """ann_ladder_probe's embeddings tiling + symlinks for every other
    table so composed queries resolve their inputs."""
    n = build_tiled_corpus(src_dir, out_dir, tile)
    for name in TABLES:
        if name == "embeddings":
            continue
        src = os.path.join(src_dir, f"{name}.parquet")
        if os.path.exists(src):
            os.symlink(src, os.path.join(out_dir, f"{name}.parquet"))
    return n


def run_one(spark, name: str, sf_dir: str, runs: int) -> tuple[float, int]:
    """Timed runs go through the noop sink, same as bench.py (count()
    would let Catalyst prune unused per-row work). Row count untimed."""
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
    ap.add_argument("--skip-20k", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma-separated query subset (any registry "
                    "names, ordered; not limited to the default LADDER)")
    ap.add_argument("--runs", type=int, default=2,
                    help="runs per cell (first is warmup unless runs=1)")
    args = ap.parse_args()
    if args.runs < 1:
        ap.error("--runs must be >= 1")
    ladder = args.only.split(",") if args.only else LADDER

    from datalakes_and_data_integration_spark.session import get_spark

    spark = get_spark()

    decades = [("2k", SF_DIR)]
    if not args.skip_20k:
        tiled = tempfile.mkdtemp(prefix="ml_probe_20k_")
        n = build_decade(SF_DIR, tiled, TILE)
        print(f"# tiled corpus: {n} vectors at {tiled}")
        decades.append(("20k", tiled))

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

    print("\n| query | 2k warm s | 2k rows | 20k warm s | 20k rows "
          "| time ratio |")
    print("|---|---|---|---|---|---|")
    for name in ladder:
        if name not in out:
            continue
        r1 = out[name].get("2k", {})
        r10 = out[name].get("20k", {})
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
    print(json.dumps({"metric": "ml_ladder_probe", "results": out}))


if __name__ == "__main__":
    main()
