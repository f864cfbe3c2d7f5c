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

import os
import sys

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)

from _ladder_common import TABLES, probe_main  # noqa: E402
from ann_ladder_probe import build_tiled_corpus  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

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
    "prototypicality_pruning",
    "centroid_classifier_eval",
    "ann_label_mrr",
    "knn_classifier_eval",
    "logreg_gd_weights",
    "logreg_confusion",
    "logreg_holdout_eval",
    "logreg_calibration_bins",
    "logreg_multihead_weights",
    # round 9, second session: held-out evaluation suite
    "logreg_roc_auc",
    "logreg_isotonic_calibration",
    "conformal_prediction_audit",
    "logreg_kfold_cv",
    "logreg_brier_decomposition",
    "coreset_kcenter_selection",
    "ann_hard_negatives",
    "embedding_near_dup",
    "embedding_near_dup_hybrid",
    "semantic_dedup_assignment",
    "embedding_corpus_manifest",
    "streaming_ivf_ingest",
    "cluster_label_purity",
    "ann_dim_truncation_report",
    "ann_nprobe_recall_curve",
    # round-7 sixth session
    "knn_graph_degree_stats",
    "ann_topk_graph_search",
]


def _symlink_rest(src_dir: str, out_dir: str) -> None:
    for name in TABLES:
        if name == "embeddings":
            continue
        src = os.path.join(src_dir, f"{name}.parquet")
        if os.path.exists(src):
            os.symlink(src, os.path.join(out_dir, f"{name}.parquet"))


def build_decade(src_dir: str, out_dir: str, tile: int) -> int:
    """ann_ladder_probe's embeddings tiling + symlinks for every other
    table so composed queries resolve their inputs."""
    n = build_tiled_corpus(src_dir, out_dir, tile)
    _symlink_rest(src_dir, out_dir)
    return n


def build_decade_rotated(src_dir: str, out_dir: str, tile: int) -> int:
    """Same geometric tiling, but copy c's labels are ROTATED by c
    (mod the 10-label domain). The default tiling keeps labels on the
    noisy copies, which degenerates LABEL-based evals — every vector's
    exact top-5 is its own copies sharing its label, so hard-negative
    mining returns 0 rows and kNN/MRR are trivially perfect. Rotation
    keeps class sizes balanced while making a vector's nearest
    neighbors (its copies) carry DIFFERENT labels — the adversarial
    regime for label evals. Use with
    ``--tiling rotated --only knn_classifier_eval,ann_label_mrr,...``;
    recall-style queries should keep the default tiling (rotation
    does not change geometry, only labels)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = build_tiled_corpus(src_dir, out_dir, tile)
    path = os.path.join(out_dir, "embeddings.parquet")
    t = pq.read_table(path)
    labels = t.column("label").to_numpy()
    # build_tiled_corpus concatenates whole copies (copy-major row
    # order) — the rotation below depends on that, so pin it instead of
    # assuming it: exact tiling, and copy 0 must equal the source labels.
    assert n % tile == 0, f"tiled corpus {n} not divisible by tile {tile}"
    n_base = n // tile
    src_labels = pq.read_table(
        os.path.join(src_dir, "embeddings.parquet")
    ).column("label").to_numpy()
    assert np.array_equal(labels[:n_base], src_labels), (
        "tiling is not copy-major: copy 0 does not match source labels"
    )
    # Rotate modulo the OBSERVED label domain (a hardcoded %10 would
    # silently skew the eval corpus if the generator's domain changed),
    # preserving the source dtype.
    domain = int(labels.max()) + 1
    copy_idx = np.arange(n) // n_base
    rotated = pa.array(
        ((labels + copy_idx) % domain).astype(labels.dtype)
    )
    t = t.set_column(t.schema.get_field_index("label"), "label", rotated)
    pq.write_table(t, path)
    _symlink_rest(src_dir, out_dir)
    return n


# Labeled eval fixture (VERDICT r6 #5): the tiled corpora measure
# RUNTIME shapes, but their label structure is degenerate (default
# tiling: neighbors are your own copies, same label; rotated tiling:
# neighbors are your copies with systematically rotated labels) — label
# METRICS on them mean nothing. This fixture is a driver-independent
# cluster-structured corpus where label metrics are meaningful:
# 10 Gaussian clusters (unit-normalized seeded centers, scale 0.45;
# within-cluster sigma 0.12 per dim — tuned so clean 5-NN accuracy is
# ~0.92 and ~55% of vectors carry a different-label neighbor in their
# top-5, the adversarial-but-learnable regime), balanced labels, plus
# 10% held-out label noise (observed label rotated off the true one),
# which upper-bounds every classifier's observable accuracy and
# guarantees hard negatives exist. Same schema as embeddings.parquet.
_LBL_CLUSTERS = 10
_LBL_CENTER_SCALE = 0.45
_LBL_SIGMA = 0.12
_LBL_NOISE = 0.10


def build_labeled_corpus(src_dir: str, out_dir: str, tile: int) -> int:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    n_base = pq.read_table(
        os.path.join(src_dir, "embeddings.parquet"), columns=["vec_id"]
    ).num_rows
    n, d = n_base * tile, 64
    rng = np.random.default_rng(7)
    centers = rng.normal(0, 1, (_LBL_CLUSTERS, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    centers *= _LBL_CENTER_SCALE
    g = np.random.default_rng(11)
    true = np.arange(n) % _LBL_CLUSTERS
    X = (centers[true] + g.normal(0, _LBL_SIGMA, (n, d))).astype(np.float32)
    noise = np.random.default_rng(13)
    flip = noise.random(n) < _LBL_NOISE
    shift = 1 + np.floor(noise.random(n) * (_LBL_CLUSTERS - 1)).astype(
        np.int64
    )  # 1..9: a flipped label is never the true one
    observed = np.where(flip, (true + shift) % _LBL_CLUSTERS, true)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(X), pa.list_(pa.float32())),
            "label": pa.array(observed.astype(np.int32)),
        }
    )
    pq.write_table(t, os.path.join(out_dir, "embeddings.parquet"))
    _symlink_rest(src_dir, out_dir)
    return n


def main() -> None:
    probe_main(
        metric="ml_ladder_probe",
        ladder=LADDER,
        base_label="2k",
        tiled_label="20k",
        sf_dir=SF_DIR,
        build_tiled=build_decade,
        tempdir_prefix="ml_probe_20k_",
        default_runs=2,
        corpus_noun="vectors",
        tilings={
            "rotated": build_decade_rotated,
            "labeled": build_labeled_corpus,
        },
    )


if __name__ == "__main__":
    main()
