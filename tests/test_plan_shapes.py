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
        # Must be the spread() round-robin specifically: three of these
        # queries end in a groupBy whose hash Exchange would satisfy a
        # bare "Exchange" check even with the spread removed — and the
        # bug is the SCAN-side work upstream of that aggregate.
        assert "RoundRobinPartitioning" in plan, (
            f"{name}: no round-robin Exchange in the plan — the "
            "spread() guard regressed and scan-side per-row work runs "
            "on one task"
        )


def test_backward_fills_use_reversed_running_frames(spark, queries):
    """Next-observation fills must run as reversed-order running
    accumulators, never as current-row -> unbounded-following frames
    (Spark re-scans the partition tail per row under those — measured
    108 s vs 11.7 s on the 9.2M-row gapfill spine, round-6 events
    ladder). The one legitimate unbounded-following shape is the
    FULL-partition frame (window_rank_family's nth_value), which is
    computed once per partition — not present in these two queries."""
    for name in ("gapfill_hourly_interpolate", "ffill_bfill"):
        plan = _plan(spark, queries, name)
        assert "unboundedfollowing" not in plan.lower(), (
            f"{name}: an unbounded-following frame reappeared — the "
            "reversed-order fill rewrite regressed"
        )


def test_label_eval_reports_avoid_bnlj_kernel(spark, queries):
    """The label-eval reports compose the hybrid exact kernel (chunked
    broadcasts + hash-join re-rank), not the bare BNLJ baseline whose
    threshold/condition evaluates interpreted per pair (round-6 ML
    ladder: 2.1-3.4x at the 20k decade). The bare baseline remains
    composed only in the recall audits. ann_retrieval_quality_report
    joined the list in round 7 (VERDICT r6 #1): its near-dup query-set
    and exact-top-5 legs now compose the hybrid twins too."""
    for name in (
        "knn_classifier_eval",
        "ann_label_mrr",
        "ann_hard_negatives",
        "ann_retrieval_quality_report",
    ):
        plan = _plan(spark, queries, name)
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: composing the bare-BNLJ kernel again"
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


def test_r7_session3_newcomer_plan_shapes(spark, queries):
    """Scale-critical plan properties of the round-7 third-session
    queries, pinned: the GDPR probe must broadcast (facts never
    shuffle for a dimension-sized forget set); the mixture sampler's
    offsets/budget frames must broadcast (no sort-merge join anywhere);
    the backlog curve's deltas side must broadcast against the day
    grid; the span rewrite is windows + group-bys only — any join
    appearing means the union trick regressed to a positional join."""
    plan = _plan(spark, queries, "gdpr_delete_manifest")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    plan = _plan(spark, queries, "token_budget_mixture_sample")
    assert "SortMergeJoin" not in plan

    plan = _plan(spark, queries, "order_backlog_curve")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan

    plan = _plan(spark, queries, "dedup_span_rewrite")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan

    plan = _plan(spark, queries, "dim_asof_enrichment")
    assert "CartesianProduct" not in plan


def test_bench_summary_line_fits_driver_tail():
    """VERDICT r7 #1: the driver keeps only ~2 KB of stdout and parses
    the LAST JSON line; the 42-key per-query map outgrew that (2,852
    bytes, BENCH_r07 "parsed": null). The compact summary line must stay
    comfortably under the tail no matter how many bench keys register,
    and the detail object must carry every per-query number."""
    import json

    import bench
    from datalakes_and_data_integration_spark import plans

    names = [n for n, q in plans.QUERIES.items() if q.bench]
    assert names, "no bench-flagged queries"
    times = {n: 123.456 for n in names}
    cold = {n: 123.456 for n in names}
    detail, summary = bench.build_outputs(times, cold, 0.1, 0.577, 0.337)
    line = json.dumps(summary)
    assert len(line) < 1000, f"summary line {len(line)} bytes"
    assert summary["n_queries"] == len(names)
    assert summary["value"] == detail["value"]
    assert set(detail["queries"]) == set(names)
    assert set(detail["cold_queries"]) == set(names)
