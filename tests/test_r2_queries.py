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
