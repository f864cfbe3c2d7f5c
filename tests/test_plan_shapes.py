"""Physical-plan regression tests: the performance properties the scale
story depends on, pinned as assertions instead of prose. If Catalyst
stops broadcasting a dim, loses a WindowGroupLimit, or a filter stops
reaching the scan, these fail — before any benchmark notices."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def queries():
    from datalakes_and_data_integration_spark.plans import all_queries

    return all_queries()


def _plan(spark, queries, name: str) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        queries[name](spark, SF).explain("formatted")
    return buf.getvalue()


def test_dim_joins_broadcast(spark, queries):
    """Star-schema dims must broadcast, never shuffle the fact side."""
    plan = _plan(spark, queries, "dau_by_nation")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topn_uses_window_group_limit(spark, queries):
    """Per-group top-n must run the partial-top-n optimization."""
    plan = _plan(spark, queries, "topn_orders_per_customer")
    assert "WindowGroupLimit" in plan


def test_zipf_head_is_take_ordered(spark, queries):
    """The vocabulary head must be a distributed TakeOrdered, not a
    global sort of the vocabulary."""
    plan = _plan(spark, queries, "vocab_zipf_stats")
    assert "TakeOrderedAndProject" in plan


def test_tpch_q6_pushes_filters_to_scan(spark, queries):
    plan = _plan(spark, queries, "tpch_q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    # The filter list must be non-empty (not "PushedFilters: []").
    assert "PushedFilters: []" not in plan


def test_scan_prunes_columns(spark, queries):
    """A 2-ish-column aggregate must not read the whole lineitem schema."""
    plan = _plan(spark, queries, "tpch_q6_forecast_revenue")
    start = plan.index("ReadSchema")
    line = plan[start : plan.index("\n", start)]
    assert "l_comment" not in line
    assert "l_orderkey" not in line


def test_no_cartesian_products_anywhere(spark, queries):
    """CartesianProduct = an unconstrained cross join over data tables.
    The registry's cross joins are all 1-row broadcast frames, which
    plan as BroadcastNestedLoopJoin — a CartesianProduct appearing
    anywhere means a join condition got lost."""
    for name in (
        "full_outer_merge_events",
        "dedup_minhash_lsh",
        "asof_join_last_click",
        "range_join_views_before_purchase",
        "cross_source_duplication",
        "hll_set_algebra",
        "training_corpus_manifest",
    ):
        plan = _plan(spark, queries, name)
        assert "CartesianProduct" not in plan, name


def test_salted_join_has_no_shuffle_on_hot_key_only(spark, queries):
    """The salted join must still be a real join (sanity: it plans)."""
    plan = _plan(spark, queries, "salted_join_user_profile")
    assert "Join" in plan


def test_scan_heavy_text_queries_spread_small_scans(spark, queries):
    """The eight scan-side-heavy text queries must not serialize their
    tokenize/regex/rolling-hash work on a small scan's single input
    split (the round-6 dedup-ladder finding: doc_fingerprint ran
    30 s/50k docs on ONE task before spread() was added). At test scale
    the parquet is one split, so the spread() repartition must appear
    as a round-robin or hash Exchange below the heavy projection."""
    for name in (
        "doc_fingerprint",
        "text_token_stats",
        "text_lang_id",
        "text_quality_score",
        "text_pii_mask",
        "lang_confusion_matrix",
        "vocab_zipf_stats",
        "tokenizer_fertility_by_lang",
    ):
        plan = _plan(spark, queries, name)
        assert "Exchange" in plan, (
            f"{name}: no Exchange in the plan — the spread() guard "
            "regressed and scan-side per-row work runs on one task"
        )


def test_lm_scoring_join_broadcasts(spark, queries):
    """The bigram LM table is vocab²-bounded: scoring must broadcast it
    onto the per-doc bigram stream, never sort-merge the corpus side."""
    plan = _plan(spark, queries, "ngram_lm_perplexity")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_quality_report_has_no_fact_shuffle_joins(spark, queries):
    """FK checks probe pre-aggregated keys against broadcast dims; no
    sort-merge join of fact rows anywhere in the 13-check report."""
    plan = _plan(spark, queries, "data_quality_report")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
