"""Documents-family decade probe (round-6 second session).

The ANN ladder probe (tools/ann_ladder_probe.py) caught a real scale bug
that was invisible at bench scale (ann_topk_lsh_bucketed scoring every
pair on one cached partition). This is the same instrument pointed at
the OTHER extension family: dedup / text / decontamination over the
``documents`` table, measured at two decades:

- sf0.1 as-is: 5,000 documents
- a 10x deterministically tiled copy: 50,000 documents

Tiling: copy 0 is the original corpus; copy c>0 offsets doc_id by
c*stride and perturbs ~2.5% of whitespace tokens (every 40th token,
phase-shifted per copy, gets a copy-specific suffix). Perturbed copies
stay near-dups of their originals (word-3-shingle Jaccard ~0.85, far
above the 0.2 / 0.15 verification thresholds) while every exact digest
differs across copies — so the exact tier's group structure scales
exactly 10x and the near-dup tiers gain a bounded ~45 true cross-copy
pairs per original document (pair output stays O(n), not O(n^2)).

For each query we record warm wall-clock and output rows at both
decades. The scaling diagnosis: a healthy plan lands near-linear
(ratio ~10-15x with log factors and the larger pair output); a
partition-collapse or candidate-blowup bug shows up as a 30x+ ratio.

Usage: python tools/dedup_ladder_probe.py [--skip-50k] [--only a,b]
Prints a markdown table (BASELINE.md format) plus one JSON line.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import pyarrow as pa
import pyarrow.parquet as pq

from _ladder_common import TABLES, probe_main

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_EVERY = 40  # perturb every 40th token => ~2.5% of tokens per copy

# Ordered cheap->heavy. Linear anchors first (embarrassingly parallel
# per-doc work), then the pair-producing tiers, then the compositions.
LADDER = [
    "doc_fingerprint",
    "text_token_stats",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard_join",
    "dedup_containment_pairs",
    "passage_dedup_rewrite",
    "dedup_cluster_assignment",
    "split_decontamination_report",
    "dedup_tier_overlap_report",
    "lexical_topk_retrieval",
    "hybrid_retrieval_rrf",
    "dedup_span_rewrite",
    "doc_novelty_score",
    "token_budget_mixture_sample",
    "minhash_estimate_audit",
    "lsh_band_tradeoff_report",
    "dup_chain_depth",
    "importance_resampling_weights",
    "dedup_prefix_filter_join",
    "ranking_agreement_rbo",
    "doc_code_switch_profile",
    "dedup_weight_preservation",
    "multimodal_keyframe_phash_dedup",
    # round-7 sixth session
    "quality_scorer_agreement",
    # round 9: the suffix-array-family exact-substring tier
    "dedup_exact_substring_spans",
    "dedup_exact_substring_rewrite",
    # round 9, third session
    "label_propagation_communities",
    "naive_bayes_classifier_eval",
    "token_pmi_collocations",
    "lang_source_mutual_information",
    "graph_clustering_coefficient",
]


def _perturb(text: str, copy: int) -> str:
    """Deterministically rewrite every ``_EVERY``-th whitespace token.

    The phase shifts with the copy index so distinct copies perturb
    DIFFERENT positions — cross-copy pairs (c1 vs c2, both nonzero)
    then differ in ~5% of tokens and remain near-dups of each other,
    not just of copy 0.
    """
    toks = text.split(" ")
    phase = copy % _EVERY
    for i in range(phase, len(toks), _EVERY):
        toks[i] = f"{toks[i]}x{copy}"
    return " ".join(toks)


def build_tiled_docs(src_dir: str, out_dir: str, tile: int) -> int:
    """Write a tile-x documents.parquet; symlink every other table so
    composed queries (splits, tier overlap) resolve their inputs."""
    t = pq.read_table(os.path.join(src_dir, "documents.parquet"))
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = t.column("source").to_pylist()
    stride = max(ids) + 1
    parts = []
    for c in range(tile):
        if c == 0:
            txt = texts
        else:
            txt = [_perturb(x, c) for x in texts]
        parts.append(
            pa.table(
                {
                    "doc_id": pa.array(
                        [i + c * stride for i in ids], pa.int64()
                    ),
                    "text": pa.array(txt, pa.string()),
                    "lang": pa.array(langs, pa.string()),
                    "source": pa.array(sources, pa.string()),
                    "n_chars": pa.array(
                        [len(x) for x in txt], pa.int64()
                    ),
                }
            )
        )
    pq.write_table(
        pa.concat_tables(parts),
        os.path.join(out_dir, "documents.parquet"),
    )
    for name in TABLES:
        if name == "documents":
            continue
        src = os.path.join(src_dir, f"{name}.parquet")
        if os.path.exists(src):
            os.symlink(src, os.path.join(out_dir, f"{name}.parquet"))
    return len(ids) * tile


def main() -> None:
    probe_main(
        metric="dedup_ladder_probe",
        ladder=LADDER,
        base_label="5k",
        tiled_label="50k",
        sf_dir=SF_DIR,
        build_tiled=build_tiled_docs,
        tempdir_prefix="dedup_probe_50k_",
        default_runs=2,
        corpus_noun="documents",
    )


if __name__ == "__main__":
    main()
