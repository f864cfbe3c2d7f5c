"""Round-7 curation additions (plans/curation7.py): invariants the
DuckDB hash-equality gate cannot express — planted-fixture span-removal
semantics, novelty accounting, and the two-pass-equals-naive proof for
the mixture sampler."""

from __future__ import annotations

import hashlib

SF = "/root/testdata/sf0.001"


def _write_docs(spark, tmp_path, texts: dict[int, str]) -> str:
    """Write a minimal documents.parquet fixture (driver schema) and
    return the sf_dir."""
    rows = [
        (int(i), t, "en", "test", len(t)) for i, t in sorted(texts.items())
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_span_rewrite_planted_duplicates(spark, tmp_path):
    from datalakes_and_data_integration_spark.plans.curation7 import (
        dedup_span_rewrite,
    )

    span = " ".join(f"s{i}" for i in range(8))  # the duplicated 8-gram
    doc1 = "a1 a2 a3 a4 " + span + " a5 a6 a7 a8"
    doc2 = "b1 b2 b3 b4 " + span + " c1 c2 c3 c4"  # cross-doc copy
    doc3 = "d1 d2 d3 d4 d5 d6 d7 d8 x d1 d2 d3 d4 d5 d6 d7 d8"  # self-rep
    sf = _write_docs(spark, tmp_path, {1: doc1, 2: doc2, 3: doc3})
    out = {r.doc_id: r for r in dedup_span_rewrite(spark, sf).collect()}

    # doc 1 holds every first occurrence: untouched.
    assert out[1].n_dup_spans == 0
    assert out[1].n_removed == 0
    assert out[1].rebuilt_md5 == hashlib.md5(doc1.encode()).hexdigest()
    # doc 2: exactly one duplicated span (grams crossing the copy
    # boundary differ), its 8 tokens removed, context survives in order.
    assert out[2].n_dup_spans == 1
    assert out[2].n_removed == 8
    expect2 = "b1 b2 b3 b4 c1 c2 c3 c4"
    assert out[2].rebuilt_md5 == hashlib.md5(expect2.encode()).hexdigest()
    # doc 3: the WITHIN-doc repeat is a duplicate too (first occurrence
    # wins under the (doc_id, position) total order).
    assert out[3].n_dup_spans == 1
    assert out[3].n_removed == 8
    expect3 = "d1 d2 d3 d4 d5 d6 d7 d8 x"
    assert out[3].rebuilt_md5 == hashlib.md5(expect3.encode()).hexdigest()
    # Token accounting is exact.
    assert out[2].n_tokens == 16
    assert out[3].n_tokens == 17


def test_span_rewrite_overlapping_spans_union(spark, tmp_path):
    """Two overlapping duplicate spans cover the UNION of their token
    ranges — coverage is per-token, not per-span."""
    from datalakes_and_data_integration_spark.plans.curation7 import (
        dedup_span_rewrite,
    )

    nine = " ".join(f"s{i}" for i in range(9))  # 9 tokens = two 8-grams
    doc1 = nine + " a1 a2 a3 a4 a5 a6 a7"
    doc2 = "b1 b2 b3 " + nine + " c1 c2 c3"  # both 8-grams duplicated
    sf = _write_docs(spark, tmp_path, {1: doc1, 2: doc2})
    out = {r.doc_id: r for r in dedup_span_rewrite(spark, sf).collect()}
    assert out[2].n_dup_spans == 2
    assert out[2].n_removed == 9  # union of [4,11] and [5,12] = 9 tokens
    expect2 = "b1 b2 b3 c1 c2 c3"
    assert out[2].rebuilt_md5 == hashlib.md5(expect2.encode()).hexdigest()


def test_novelty_score_invariants(spark):
    from datalakes_and_data_integration_spark.plans.curation7 import (
        doc_novelty_score,
    )

    rows = doc_novelty_score(spark, SF).collect()
    assert rows
    by_id = {r.doc_id: r for r in rows}
    # The smallest doc_id owns every one of its shingles by definition.
    first = by_id[min(by_id)]
    assert first.n_novel == first.n_shingles
    assert first.novelty_permille == 1000
    for r in rows:
        assert 0 <= r.n_novel <= r.n_shingles
        assert r.novelty_permille == (1000 * r.n_novel) // r.n_shingles
    # Non-vacuous: the corpus shares shingles (the containment tier
    # finds pairs), so somebody scores below 1000.
    assert any(r.novelty_permille < 1000 for r in rows)


def test_mixture_two_pass_equals_naive_window(spark):
    """The implementation's bucketed two-pass running sum must equal the
    oracle's naive per-language window — same cum_tokens, same verdict,
    row for row. (The driver's hash gate proves this against DuckDB;
    this pins it inside Spark with no oracle in the loop.)"""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from datalakes_and_data_integration_spark.functions.hashing import (
        hash60_seeded,
    )
    from datalakes_and_data_integration_spark.plans._util import T
    from datalakes_and_data_integration_spark.plans.curation7 import (
        _MIX_SEED,
        _TOK_SPARK,
        token_budget_mixture_sample,
    )

    got = {
        r.doc_id: r
        for r in token_budget_mixture_sample(spark, SF).collect()
    }
    d = T(spark, SF, "documents").select(
        "doc_id",
        "lang",
        F.size(F.expr(_TOK_SPARK)).cast("long").alias("n_tokens"),
        hash60_seeded(F.col("doc_id").cast("string"), _MIX_SEED).alias("h"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = d.withColumn("cum", F.sum("n_tokens").over(w)).collect()
    total = sum(r.n_tokens for r in naive)
    budget = total // len({r.lang for r in naive})
    assert len(naive) == len(got)
    for r in naive:
        g = got[r.doc_id]
        assert g.cum_tokens == r.cum, (r.doc_id, g.cum_tokens, r.cum)
        assert g.selected == (r.cum <= budget), r.doc_id
    # Non-vacuous both ways: the budget binds somewhere and admits
    # somebody.
    assert any(g.selected for g in got.values())
    assert any(not g.selected for g in got.values())


def test_mixture_selected_is_hash_order_prefix(spark):
    from datalakes_and_data_integration_spark.functions.hashing import (
        hash60_py,
    )
    from datalakes_and_data_integration_spark.plans.curation7 import (
        _MIX_SEED,
        token_budget_mixture_sample,
    )

    rows = token_budget_mixture_sample(spark, SF).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, members in by_lang.items():
        members.sort(
            key=lambda r: (hash60_py(str(r.doc_id), _MIX_SEED), r.doc_id)
        )
        # selected is a prefix of the hash order, and cum_tokens is the
        # running sum along it.
        run = 0
        seen_unselected = False
        for r in members:
            run += r.n_tokens
            assert r.cum_tokens == run, (lang, r.doc_id)
            if not r.selected:
                seen_unselected = True
            else:
                assert not seen_unselected, (
                    f"{lang}: selected doc after an unselected one"
                )
