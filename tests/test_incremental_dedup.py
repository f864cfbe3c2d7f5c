"""Incremental MinHash dedup: near-dups arriving in LATER micro-batches
are rejected by the persisted band index — the cross-batch dedup the
batch query cannot provide without re-scanning the corpus."""

from __future__ import annotations

import tempfile

import pytest


@pytest.fixture()
def docs(spark):
    base = (
        "spark shuffle partition broadcast join aggregate window "
        "stream batch column row table query plan codegen"
    )
    other = (
        "completely different content about weather rain sun cloud "
        "storm wind snow hail fog mist drizzle thunder lightning"
    )
    third = (
        "yet another unrelated text with fruit apple banana cherry "
        "orange grape melon peach plum apricot kiwi mango papaya"
    )
    near_dup = base + " extra trailing tokens"
    return {
        "b1": [(1, base), (2, other)],
        "b2": [(3, near_dup), (4, third)],
    }


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_cross_batch_near_dup_rejected(spark, docs):
    from datalakes_and_data_integration_spark.streaming.incremental_dedup import (
        incremental_minhash_dedup,
    )

    state = tempfile.mkdtemp(prefix="incdedup_")
    kept1 = incremental_minhash_dedup(spark, state, _df(spark, docs["b1"]))
    assert {r.doc_id for r in kept1.collect()} == {1, 2}

    kept2 = incremental_minhash_dedup(spark, state, _df(spark, docs["b2"]))
    # doc 3 is a near-dup of doc 1 (same 3-shingle prefix -> identical
    # minhash bands); doc 4 is novel.
    assert {r.doc_id for r in kept2.collect()} == {4}

    table = spark.read.parquet(f"{state}/kept")
    assert {r.doc_id for r in table.collect()} == {1, 2, 4}


def test_redelivered_batch_is_idempotent(spark, docs):
    from datalakes_and_data_integration_spark.streaming.incremental_dedup import (
        incremental_minhash_dedup,
    )

    state = tempfile.mkdtemp(prefix="incdedup_")
    incremental_minhash_dedup(spark, state, _df(spark, docs["b1"]))
    # At-least-once delivery: the same batch arrives again. Every doc
    # collides with its own bands in the index -> nothing is re-accepted.
    kept_again = incremental_minhash_dedup(spark, state, _df(spark, docs["b1"]))
    assert kept_again.count() == 0
    table = spark.read.parquet(f"{state}/kept")
    assert {r.doc_id for r in table.collect()} == {1, 2}


def test_in_batch_collision_keeps_smallest(spark):
    from datalakes_and_data_integration_spark.streaming.incremental_dedup import (
        incremental_minhash_dedup,
    )

    text = (
        "one single shared document body with enough words to form "
        "several three gram shingles for the minhash signature family"
    )
    state = tempfile.mkdtemp(prefix="incdedup_")
    kept = incremental_minhash_dedup(
        spark, state, _df(spark, [(10, text), (11, text), (12, text)])
    )
    assert {r.doc_id for r in kept.collect()} == {10}


def test_agrees_with_batch_query_on_the_corpus(spark):
    """One-batch run accepts exactly the batch pipeline's kept corpus
    minus in-batch band collisions: every doc the incremental path drops
    must collide (via some band) with an accepted doc."""
    from datalakes_and_data_integration_spark.streaming.incremental_dedup import (
        incremental_minhash_dedup,
        minhash_bands,
    )
    from datalakes_and_data_integration_spark.plans._util import T

    sf = "/root/testdata/sf0.001"
    docs = T(spark, sf, "documents").select("doc_id", "text")
    state = tempfile.mkdtemp(prefix="incdedup_")
    kept = incremental_minhash_dedup(spark, state, docs)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    dropped = all_ids - kept_ids
    assert kept_ids  # something survives
    if not dropped:
        return
    bands = minhash_bands(docs)
    rows = bands.collect()
    by_key: dict[tuple, set] = {}
    for r in rows:
        by_key.setdefault((r.band, r.bv), set()).add(r.doc_id)
    for d in dropped:
        assert any(
            d in ids and (ids & kept_ids) for ids in by_key.values()
        ), f"doc {d} dropped without a collision against a kept doc"
