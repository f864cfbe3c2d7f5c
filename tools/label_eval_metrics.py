"""Label-eval METRIC values on the labeled fixture (VERDICT r6 #5).

The family ladders measure runtime; this tool measures what the label
evals actually report — kNN / nearest-centroid accuracy, mean MRR, and
hard-negative yield — on the cluster-structured labeled fixture
(tools/ml_ladder_probe.build_labeled_corpus: 10 Gaussian clusters, 10%
held-out label noise), where those numbers are meaningful. On the tiled
runtime corpora they are degenerate by construction (neighbors are your
own copies); NOTES round-6 item 9 conceded exactly this gap.

Expected shape of the numbers: clean 5-NN accuracy on this geometry is
~0.92 and 10% of labels are flipped, so observable accuracy should land
around 0.8 (well above the 0.1 majority-class floor, well below 1.0 —
non-trivial in both directions), MRR strictly inside (0, 1), and
hard-negative yield well above the noise floor.

Usage: python tools/label_eval_metrics.py [--sizes 2k,20k] [--runs 1]
Prints a BASELINE.md-format table plus one JSON line.
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

from ml_ladder_probe import SF_DIR, build_labeled_corpus  # noqa: E402


def _accuracy_from_confusion(rows) -> tuple[float, int]:
    total = sum(r["n"] for r in rows)
    hit = sum(r["n"] for r in rows if r["label_true"] == r["label_pred"])
    return (hit / total if total else 0.0), total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2k,20k",
                    help="comma list drawn from 2k (tile=1) / 20k (tile=10)")
    args = ap.parse_args()
    tiles = {"2k": 1, "20k": 10}
    sizes = [s for s in args.sizes.split(",") if s]
    bad = [s for s in sizes if s not in tiles]
    if bad:
        ap.error(f"unknown sizes {bad}; choose from {sorted(tiles)}")

    from datalakes_and_data_integration_spark.plans import QUERIES
    from datalakes_and_data_integration_spark.session import get_spark

    spark = get_spark()
    out: dict[str, dict] = {}
    for size in sizes:
        d = tempfile.mkdtemp(prefix=f"label_eval_{size}_")
        n = build_labeled_corpus(SF_DIR, d, tiles[size])
        print(f"# labeled fixture at {d}: {n} vectors", flush=True)
        cell: dict[str, float] = {"n_vectors": n}

        t0 = time.monotonic()
        conf = [
            r.asDict()
            for r in QUERIES["knn_classifier_eval"].spark(spark, d).collect()
        ]
        acc, total = _accuracy_from_confusion(conf)
        cell["knn5_accuracy"] = round(acc, 4)
        cell["knn_sec"] = round(time.monotonic() - t0, 2)

        t0 = time.monotonic()
        cent = [
            r.asDict()
            for r in QUERIES["centroid_classifier_eval"]
            .spark(spark, d)
            .collect()
        ]
        # (label_true, label_pred, n) confusion over the held-out split.
        acc2, _ = _accuracy_from_confusion(cent)
        cell["centroid_accuracy"] = round(acc2, 4)
        cell["centroid_sec"] = round(time.monotonic() - t0, 2)

        t0 = time.monotonic()
        # (label, n_queries, n_hits, mean_rr) per label.
        mrr_rows = [
            r.asDict()
            for r in QUERIES["ann_label_mrr"].spark(spark, d).collect()
        ]
        tot_w = sum(r["n_queries"] for r in mrr_rows)
        mean_mrr = (
            sum(r["mean_rr"] * r["n_queries"] for r in mrr_rows) / tot_w
            if tot_w
            else 0.0
        )
        cell["mean_mrr"] = round(mean_mrr, 4)
        cell["mrr_sec"] = round(time.monotonic() - t0, 2)

        t0 = time.monotonic()
        hn = QUERIES["ann_hard_negatives"].spark(spark, d).count()
        cell["hard_negatives"] = hn
        cell["hard_negative_rate"] = round(hn / n, 4)
        cell["hardneg_sec"] = round(time.monotonic() - t0, 2)

        out[size] = cell
        print(f"# {size}: {cell}", flush=True)

    print("\n| size | n | knn5 acc | centroid acc | mean MRR "
          "| hard negs | hn rate |")
    print("|---|---|---|---|---|---|---|")
    for size in sizes:
        c = out[size]
        print(
            f"| {size} | {c['n_vectors']} | {c['knn5_accuracy']} | "
            f"{c['centroid_accuracy']} | {c['mean_mrr']} | "
            f"{c['hard_negatives']} | {c['hard_negative_rate']} |"
        )
    print(json.dumps({"metric": "label_eval_metrics", "results": out}))


if __name__ == "__main__":
    main()
