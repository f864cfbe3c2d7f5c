"""Threshold parity for the corpus-capped ANN training sample (round 6).

Round 5 moved every ANN k-means stage onto a deterministic 25% md5
sample; round 6 caps it — rate = min(1/4, TRAIN_SAMPLE_CAP / n) — so
past n = 4*CAP the training SET size holds at ~TRAIN_SAMPLE_CAP vectors
(the faiss shape: training cost independent of corpus size). The Spark
side resolves the threshold to a literal from one scalar count; the
DuckDB oracles compute the identical threshold with a scalar subquery
over count(*). These tests pin:

1. the integer threshold math (non-binding regime reproduces the old
   "md5 < '4'" sample exactly; binding regime targets the cap),
2. byte-for-byte threshold parity between the Python literal and the
   DuckDB scalar-subquery twin (lower/lpad/to_hex dialect included),
3. end-to-end membership parity: the Spark-shaped literal filter and
   the oracle predicate select the SAME vectors from the same corpus.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from datalakes_and_data_integration_spark.plans.similarity import (
    TRAIN_SAMPLE_CAP,
    TRAIN_SAMPLE_PRED,
    _TS_QUARTER,
    _TS_SCALE,
    train_sample_hex,
)


def test_nonbinding_threshold_is_the_historical_quarter():
    # For every corpus up to 4x the cap the threshold is exactly
    # '400000' — which selects the same digests as the round-5 "< '4'"
    # prefix predicate (a 32-digit md5 equal-prefixed '400000...' sorts
    # ABOVE both thresholds).
    for n in (1, 500, 2_000, 20_000, 4 * TRAIN_SAMPLE_CAP):
        assert train_sample_hex(n) == "400000", n


def test_binding_threshold_targets_the_cap():
    # Past 4x the cap, expected sample size = threshold/SCALE * n must
    # land within one granularity step (n/SCALE) of the cap.
    for n in (4 * TRAIN_SAMPLE_CAP + 1, 1_000_000, 50_000_000):
        t = int(train_sample_hex(n), 16)
        assert t < _TS_QUARTER
        expected = t * n / _TS_SCALE
        assert TRAIN_SAMPLE_CAP - n / _TS_SCALE - 1 <= expected
        assert expected <= TRAIN_SAMPLE_CAP


@pytest.mark.parametrize("n", [500, 2_000, 300_000, 1_000_000])
def test_duckdb_scalar_subquery_matches_python_literal(n):
    # The oracle predicate embeds "(SELECT <threshold expr> FROM
    # embeddings)"; evaluate that exact subquery against an n-row
    # embeddings view and compare with the Python literal.
    sub = TRAIN_SAMPLE_PRED.split("< ")[1]
    assert sub.startswith("(SELECT") and sub.endswith(")")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS "
        f"SELECT unnest(range(0, {n})) AS vec_id"
    )
    got = con.execute(f"SELECT {sub}").fetchone()[0]
    assert got == train_sample_hex(n)


def test_membership_parity_binding_and_nonbinding():
    # Same 2,000-id corpus, both regimes: the oracle predicate's
    # selected set must equal the Python-side md5-literal filter (the
    # shape train_sample applies in Spark).
    ids = list(range(2_000))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT unnest(range(0, 2000)) AS vec_id"
    )
    duck = {
        r[0]
        for r in con.execute(
            f"SELECT vec_id FROM embeddings WHERE {TRAIN_SAMPLE_PRED}"
        ).fetchall()
    }
    thr = train_sample_hex(len(ids))
    py = {
        i
        for i in ids
        if hashlib.md5(str(i).encode()).hexdigest() < thr
    }
    assert duck == py and 400 <= len(py) <= 600  # ~25% of 2,000

    # Binding regime: simulate a 1M corpus threshold applied to the same
    # ids — membership must again agree between the Python literal and
    # a DuckDB filter using that literal (the driver-resolved shape).
    thr_big = train_sample_hex(1_000_000)
    duck_big = {
        r[0]
        for r in con.execute(
            "SELECT vec_id FROM embeddings "
            f"WHERE md5(CAST(vec_id AS VARCHAR)) < '{thr_big}'"
        ).fetchall()
    }
    py_big = {
        i
        for i in ids
        if hashlib.md5(str(i).encode()).hexdigest() < thr_big
    }
    assert duck_big == py_big
    # ~CAP/1M rate on 2,000 ids -> expected ~131 of 2,000.
    assert 60 <= len(py_big) <= 260
