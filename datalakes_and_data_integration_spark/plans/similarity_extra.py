"""Similarity queries added after the round-2 driver-window cutoff
(see plans/__init__.py — registration order is the driver's verification
window; this module registers last on purpose)."""

from __future__ import annotations

from datalakes_and_data_integration_spark.plans._util import T
from datalakes_and_data_integration_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Per-label covariance spectrum head: leading eigenvalue of each label's
# 64x64 embedding covariance, via applyInPandas (Arrow-batched grouped
# map) — the one custom-operator tier not otherwise in the registry
# (mapInPandas: multimodal; applyInPandasWithState: streaming). Power
# iteration with a FIXED iteration count and a fixed all-ones start is
# deterministic for a PSD matrix with a dominant eigenvalue; rows-only
# for the driver because per-group eigen-iteration is not
# SQL-expressible. The variance-concentration signal for deciding
# quantization/projection budgets per class.
# ---------------------------------------------------------------------------


@register(
    "label_cov_top_eigen",
    oracle=None,  # per-group eigen power iteration is not SQL-expressible
    description="Leading covariance eigenvalue per embedding label via "
    "applyInPandas: each group's vectors arrive as one Arrow batch, "
    "numpy computes the 64x64 covariance and 30 fixed power iterations "
    "from an all-ones start (deterministic). Scale: per-group work is "
    "O(n x d^2) with d=64 — the shuffle is one hash partition by label; "
    "the 100 TB variant pre-aggregates the d^2 moment sums as DataFrame "
    "aggregates and eigensolves the tiny matrices on the driver.",
    tags=("similarity", "pandas-udf", "spectrum", "llm-pipeline"),
)
def label_cov_top_eigen(spark, sf_dir):
    import pandas as pd  # noqa: PLC0415 - worker-side import

    e = T(spark, sf_dir, "embeddings")

    def top_eigen(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np  # noqa: PLC0415 - worker-side import

        X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        n = X.shape[0]
        mu = X.mean(axis=0)
        Xc = X - mu
        C = (Xc.T @ Xc) / n
        v = np.ones(C.shape[0]) / np.sqrt(C.shape[0])
        for _ in range(30):
            w = C @ v
            nrm = np.linalg.norm(w)
            if nrm == 0.0:
                break
            v = w / nrm
        lam = float(v @ (C @ v))
        tr = float(np.trace(C))
        return pd.DataFrame(
            {
                "label": [int(pdf["label"].iloc[0])],
                "n_vectors": [n],
                "top_eigenvalue": [round(lam, 6)],
                "trace": [round(tr, 6)],
                "top_share": [round(lam / tr, 6) if tr > 0 else 0.0],
            }
        )

    return (
        e.select("label", "embedding")
        .groupBy("label")
        .applyInPandas(
            top_eigen,
            "label bigint, n_vectors bigint, top_eigenvalue double, "
            "trace double, top_share double",
        )
    )
