"""Invariant tests for the round-2 query additions.

The oracle gate (tools/check_correctness.py) proves value-equality with
DuckDB; these tests pin the *structural* invariants that equality alone
would not catch if both engines drifted together — packing contiguity,
hash-bucket ranges, rate bounds, anomaly-flag consistency.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries():
    from datalakes_and_data_integration_spark.plans import all_queries

    return all_queries()


def test_sequence_packing_contiguous(spark, queries):
    rows = queries["sequence_packing"](spark, SF).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    assert by_lang
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.doc_id)
        # The token stream is contiguous: each doc starts where the
        # previous one ended, starting from offset 0.
        offset = 0
        for r in rs:
            assert r.tok_start == offset, (lang, r.doc_id)
            offset += r.n_tokens
            assert r.seq_first == r.tok_start // 512
            assert r.seq_last >= r.seq_first
            # A doc spans exactly the sequences its token range covers.
            last_tok = max(r.tok_start, r.tok_start + r.n_tokens - 1)
            assert r.seq_last == max(r.seq_first, last_tok // 512)


def test_feature_hashing_bounds(spark, queries):
    rows = queries["feature_hashing"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.bucket < 1024
        assert r.cnt >= 1
        # signed_sum is a sum of cnt values from {-1, +1}.
        assert abs(r.signed_sum) <= r.cnt
        assert (r.cnt + r.signed_sum) % 2 == 0


def test_cross_source_duplication_bounds(spark, queries):
    out = queries["cross_source_duplication"](spark, SF).collect()
    for r in out:
        assert r.source_a < r.source_b
        assert r.n_shared >= 1
        assert 0.0 < r.frac_of_a <= 1.0
        assert 0.0 < r.frac_of_b <= 1.0


def test_rolling_zscore_flag_consistency(spark, queries):
    rows = queries["rolling_zscore_anomaly"](spark, SF).collect()
    assert rows
    seen_scored = False
    for r in rows:
        assert r.n_24h >= 1
        assert r.std_24h is not None and r.std_24h >= 0
        if r.zscore is not None:
            seen_scored = True
            assert r.is_anomaly == (abs(r.zscore) > 3) or (
                # round(z, 6) can cross the 3.0 boundary; the flag is
                # computed on the unrounded value.
                abs(abs(r.zscore) - 3.0) < 1e-6
            )
        else:
            assert r.is_anomaly is False
    assert seen_scored


def test_quantization_error_bounds(spark, queries):
    rows = queries["embedding_quantization_error"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.mse_q8 >= 0
        assert r.linf_q8 >= 0
        # L-inf dominates the per-dim RMS contribution.
        assert r.linf_q8 * r.linf_q8 + 1e-9 >= r.mse_q8


def test_quality_vs_duplication_partitions_corpus(spark, queries):
    from datalakes_and_data_integration_spark.plans._util import T

    out = queries["quality_vs_duplication"](spark, SF).collect()
    n_docs = T(spark, SF, "documents").count()
    assert sum(r.n_docs for r in out) == n_docs
    for r in out:
        assert 0 <= r.n_dropped <= r.n_dup <= r.n_docs


def test_cms_never_underestimates(spark, queries):
    rows = queries["heavy_hitters_cms"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.cms_est >= r.exact_freq


def test_bloom_has_no_false_negatives(spark, queries):
    (r,) = queries["bloom_prefilter_audit"](spark, SF).collect()
    assert r.n_bloom_pass >= r.n_members
    assert r.n_false_pos == r.n_bloom_pass - r.n_members
    assert 0.0 <= r.fp_rate <= 1.0


def test_hll_set_algebra_bounds(spark, queries):
    (r,) = queries["hll_set_algebra"](spark, SF).collect()
    # Union estimate can't exceed the sum of the parts (register max is
    # dominated by the per-set registers), and inclusion-exclusion holds
    # by construction.
    assert r.est_union <= r.est_a + r.est_b + 1e-9
    assert r.exact_intersection == r.exact_a + r.exact_b - r.exact_union
    assert abs(
        r.est_intersection - (r.est_a + r.est_b - r.est_union)
    ) < 1e-3


def test_pagerank_mass_and_floor(spark, queries):
    rows = queries["pagerank_dup_hubs"](spark, SF).collect()
    assert rows
    scale = 10**12
    n = len(rows)
    base = (15 * (scale // n)) // 100
    total = sum(r.pr_fixed for r in rows)
    # Damping leaks mass (floor division + no dangling redistribution):
    # total never exceeds the initial mass, every node keeps >= base.
    assert total <= scale
    for r in rows:
        assert r.pr_fixed >= base


def test_ks_stat_in_unit_interval(spark, queries):
    (r,) = queries["ks_drift_n_chars"](spark, SF).collect()
    assert 0.0 <= r.ks_stat <= 1.0
    assert r.n_a > 0 and r.n_b > 0


def test_transition_probabilities_normalize(spark, queries):
    rows = queries["event_transition_matrix"](spark, SF).collect()
    by_prev: dict[str, float] = {}
    for r in rows:
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.p
    assert by_prev
    for prev, total in by_prev.items():
        assert abs(total - 1.0) < 1e-4, (prev, total)


def test_cc_algorithms_agree(spark, queries):
    """Label propagation and large-star/small-star are independent CC
    algorithms over the same near-dup graph; beyond each matching the
    recursive-CTE oracle, they must agree row-for-row with each other."""
    a = {
        r.doc: (r.cluster_id, r.has_near_dup)
        for r in queries["dedup_cluster_assignment"](spark, SF).collect()
    }
    b = {
        r.doc: (r.cluster_id, r.has_near_dup)
        for r in queries["dedup_cluster_largestar"](spark, SF).collect()
    }
    assert a == b and a


def test_logreg_training_learns(spark, queries):
    """Three cost-sensitive GD iterations from zero must produce a
    non-trivial model: weights moved (bounded by the lr), and the learned
    decision boundary recovers most of the minority class (better than
    both the all-negative and the random-guess confusion)."""
    rows = {r.dim: r.weight for r in queries["logreg_gd_weights"](spark, SF).collect()}
    assert len(rows) == 65  # 64 dims + bias at -1
    moved = [w for d, w in rows.items() if d >= 0 and w != 0.0]
    assert len(moved) > 32  # most dimensions carry signal
    assert all(abs(w) < 1.0 for w in rows.values())  # lr-bounded, no blowup
    cells = {
        (r.label_true, r.pred_pos): r.n
        for r in queries["logreg_confusion"](spark, SF).collect()
    }
    tp = cells.get((1, True), 0)
    fn = cells.get((1, False), 0)
    assert tp > fn  # recalls most of the 10% positive class


def test_multihead_head0_equals_single_head(spark, queries):
    """Head 0 of the joint trainer runs the same arithmetic as the
    single-head trainer — the 650-column fused aggregate must not change
    a single bit of any head's result."""
    single = {
        r.dim: r.weight
        for r in queries["logreg_gd_weights"](spark, SF).collect()
    }
    multi = {
        r.dim: r.weight
        for r in queries["logreg_multihead_weights"](spark, SF).collect()
        if r.head == 0
    }
    assert multi == single
