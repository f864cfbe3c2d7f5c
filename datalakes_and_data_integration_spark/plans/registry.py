"""Query registry: name -> (spark impl, oracle SQL, metadata).

Contract (driver-imposed, see repo __spark_entry__.py):
- spark impl: ``(spark: SparkSession, sf_dir: str) -> DataFrame``
- oracle SQL: ANSI SQL DuckDB can run against views named after the parquet
  tables (region nation customer supplier part orders lineitem events
  documents embeddings). ``None`` for non-SQL-expressible ops (the driver
  then records a weaker rows-only check).
- Column names must match exactly between the two (the comparison sorts
  columns by name before hashing values).

Determinism rules used throughout (see SURVEY.md §7.4):
- Money-style aggregates go through DECIMAL so the sum is order-independent,
  then cast to DOUBLE for a stable comparable schema.
- Every ranking has an explicit total-order tiebreak.
- Every hash shared with the oracle is md5-derived (identical hex output in
  Spark and DuckDB), never engine-native ``hash()``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


QUERIES: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    description: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    """Decorator: register a spark query impl under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name, fn, oracle, description, tags, bench)
        return fn

    return deco


# The driver hash-verifies only the FIRST 50 entries of all_queries() per
# round, so the window is rotated explicitly each round. STANDING POLICY
# (adopted round 6, after the round-5 window retired the last
# verification debt — every one of the 230 registered queries now has a
# green driver row):
#   (a) every query whose code changed since its newest green driver row
#       enters the next window (ROUND_CHANGED below names them — the
#       round-5 precedent: changed code must carry FRESH driver
#       evidence, not stale green rows);
#   (b) the remaining slots re-verify the queries whose newest green row
#       is OLDEST (cohort ties broken by keeping a round's cohort
#       together alphabetically), so re-verification latency is bounded
#       at ~(registry size / 50) rounds for every query.
# Enforced by tests/test_registry_window.py::
# test_window_follows_changed_plus_oldest_policy, which recomputes the
# newest-green-row map from the CORRECTNESS_r*.json files older than
# WINDOW_ROUND. Round-7 window: the 4 IVF/PQ ANN queries whose scoring
# moved into the vectorized numpy scan kernels (VERDICT r6 #2), the
# retrieval-quality capstone's hybrid-kernel swap (VERDICT r6 #1), the
# tier-overlap report's shared materialized shingle pass (VERDICT r6
# #4) plus the three dedup tiers whose signatures grew the optional
# pre-shingled frame for it (default path byte-identical, but changed
# code carries fresh driver evidence — the standing clause (a)), and
# the twenty round-7 newcomers ann_index_health_report +
# streaming_decontamination_gate + semantic_dedup_assignment +
# prototypicality_pruning + lexical_topk_retrieval +
# hybrid_retrieval_rrf + scd2_dimension_build +
# embedding_corpus_manifest + dedup_span_rewrite + doc_novelty_score +
# token_budget_mixture_sample + streaming_scd2_upsert +
# streaming_ivf_ingest + cluster_label_purity + gdpr_delete_manifest +
# minhash_estimate_audit + attribution_multi_touch + dim_snapshot_diff +
# lsh_band_tradeoff_report + user_lifespan_survival +
# dim_asof_enrichment + order_backlog_curve +
# join_cardinality_estimate_audit (never verified — clause (a) by
# definition), the dedup_minhash_lsh refactor onto the shared
# signature builders (clause (a): changed code, byte-identical plan),
# and the 18-query oldest cohort: the first 18 of the round-1 names
# that yielded slots in rounds 5/6 (topn, the tpch suite,
# union_dedup_events; user_first_last_event and
# value_histogram/percentiles yielded this round). 32 + 18 = 50.
# FOURTH SESSION: eleven never-verified newcomers (skyline_pareto_
# frontier, zorder_layout_plan, dup_chain_depth, importance_resampling_
# weights, bitmap_distinct_rollup, dedup_prefix_filter_join,
# t_closeness_audit, ranking_agreement_rbo, ann_dim_truncation_report,
# snapshot_retention_plan, km_hazard_table) plus
# dedup_ngram_jaccard_join (clause (a): _jaccard_oracle grew the
# threshold parameter for the prefix-filter twin — registered SQL byte-
# identical). Cohort trimmed from its end to the first 6 round-1 names.
# 44 + 6 = 50.
# FIFTH SESSION: six never-verified newcomers (watermark_lateness_
# profile, cdc_merge_apply, doc_code_switch_profile,
# dedup_weight_preservation, multimodal_keyframe_phash_dedup,
# ann_nprobe_recall_curve — the last also re-slots ann_topk_ivf, already
# in the window, whose pipeline was refactored into _ivf_topk_multi with
# a byte-identical default path). The cohort yields its remaining slots:
# 50 + 0 = 50, every slot clause (a).
# SIXTH SESSION: the window was already FULL (50 clause-(a) slots), so
# this session's newcomers register BEHIND the window and carry their
# clause-(a) debt to the ROUND-8 rotation (head of its ROUND_CHANGED):
# rolling_exact_distinct_users_7d, compaction_bin_packing_plan,
# deletion_vector_cost_report, data_skipping_effectiveness,
# streaming_heavy_hitters_cms, cbo_stats_selectivity_audit,
# incremental_join_view_maintenance, cube_distinct_hll,
# table_diff_merkle, streaming_bitmap_distinct_maintenance,
# knn_graph_degree_stats, dp_noisy_release_audit,
# histogram_quantile_audit, lakehouse_maintenance_planner,
# ann_topk_graph_search, quality_scorer_agreement — each
# triple-SF gated by tools/check_correctness.py in-session (the advance
# evidence the driver row will confirm next round). Also round-8 clause
# (a): multimodal_phash_neardup — the deferred perceptual_hash
# consolidation onto _block_mean_phash landed this session (identical
# integer arithmetic; re-gated at 3 SFs in-session) — and, from the
# session code-review pass (shared-builder consolidations, identical
# arithmetic, all re-gated at 3 SFs in-session): distinct_count_hll,
# hll_set_algebra, rolling_distinct_hll_7d (HLL estimate now routes
# through hll_sum_aggs/hll_corrected_col). bitmap_distinct_rollup also
# changed (bitmap_word_rows/bitmap_popcount_report) but sits in the
# CURRENT window, so its round-7 driver row verifies the new code.
WINDOW_ROUND = 7  # the driver round this window was built for
ROUND_CHANGED: list[str] = [
    # policy clause (a): code changed since the newest green row
    "ann_topk_pq",
    "ann_topk_ivfadc",
    "ann_topk_ivfadc_residual",
    "ann_topk_ivf",
    "ann_retrieval_quality_report",
    "dedup_tier_overlap_report",
    "dedup_containment_pairs",
    "dedup_minhash_lsh",
    "dedup_cluster_assignment",
    # round-7 newcomers: no green row exists yet
    "ann_index_health_report",
    "streaming_decontamination_gate",
    "semantic_dedup_assignment",
    "prototypicality_pruning",
    "lexical_topk_retrieval",
    "hybrid_retrieval_rrf",
    "scd2_dimension_build",
    "embedding_corpus_manifest",
    "dedup_span_rewrite",
    "doc_novelty_score",
    "token_budget_mixture_sample",
    "streaming_scd2_upsert",
    "streaming_ivf_ingest",
    "cluster_label_purity",
    "gdpr_delete_manifest",
    "minhash_estimate_audit",
    "attribution_multi_touch",
    "dim_snapshot_diff",
    "lsh_band_tradeoff_report",
    "user_lifespan_survival",
    "dim_asof_enrichment",
    "order_backlog_curve",
    "join_cardinality_estimate_audit",
    # round-7 fourth session newcomers
    "skyline_pareto_frontier",
    "zorder_layout_plan",
    "dup_chain_depth",
    "importance_resampling_weights",
    "bitmap_distinct_rollup",
    "dedup_prefix_filter_join",
    "t_closeness_audit",
    "ranking_agreement_rbo",
    "ann_dim_truncation_report",
    # clause (a): _jaccard_oracle grew a threshold parameter for the
    # prefix-filter twin — this query's registered SQL/plan are byte-
    # identical (default arg), but changed builder code carries fresh
    # driver evidence per the standing policy
    "dedup_ngram_jaccard_join",
    "snapshot_retention_plan",
    "km_hazard_table",
    # round-7 fifth session newcomers
    "watermark_lateness_profile",
    "cdc_merge_apply",
    "doc_code_switch_profile",
    "dedup_weight_preservation",
    "multimodal_keyframe_phash_dedup",
    "ann_nprobe_recall_curve",
]
WINDOW_PRIORITY: list[str] = [
    "ann_topk_pq",
    "ann_topk_ivfadc",
    "ann_topk_ivfadc_residual",
    "ann_topk_ivf",
    "ann_retrieval_quality_report",
    "dedup_tier_overlap_report",
    "dedup_containment_pairs",
    "dedup_minhash_lsh",
    "dedup_cluster_assignment",
    "ann_index_health_report",
    "streaming_decontamination_gate",
    "semantic_dedup_assignment",
    "prototypicality_pruning",
    "lexical_topk_retrieval",
    "hybrid_retrieval_rrf",
    "scd2_dimension_build",
    "embedding_corpus_manifest",
    "dedup_span_rewrite",
    "doc_novelty_score",
    "token_budget_mixture_sample",
    "streaming_scd2_upsert",
    "streaming_ivf_ingest",
    "cluster_label_purity",
    "gdpr_delete_manifest",
    "minhash_estimate_audit",
    "attribution_multi_touch",
    "dim_snapshot_diff",
    "lsh_band_tradeoff_report",
    "user_lifespan_survival",
    "dim_asof_enrichment",
    "order_backlog_curve",
    "join_cardinality_estimate_audit",
    "skyline_pareto_frontier",
    "zorder_layout_plan",
    "dup_chain_depth",
    "importance_resampling_weights",
    "bitmap_distinct_rollup",
    "dedup_prefix_filter_join",
    "t_closeness_audit",
    "ranking_agreement_rbo",
    "ann_dim_truncation_report",
    "dedup_ngram_jaccard_join",
    "snapshot_retention_plan",
    "km_hazard_table",
    "watermark_lateness_profile",
    "cdc_merge_apply",
    "doc_code_switch_profile",
    "dedup_weight_preservation",
    "multimodal_keyframe_phash_dedup",
    "ann_nprobe_recall_curve",
    # cohort: none this round — the 50 slots are fully consumed by
    # clause (a) (44 carried from sessions 1-4 + 6 fifth-session
    # newcomers); topn_orders_per_customer (r1) yields and heads the
    # round-8 oldest cohort
]


def _ordered_names() -> list[str]:
    pri = [n for n in WINDOW_PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(pri)]
    return pri + rest


def all_queries() -> dict[str, SparkQuery]:
    return {n: QUERIES[n].spark for n in _ordered_names()}


def all_oracle_sql() -> dict[str, str]:
    return {
        n: QUERIES[n].oracle
        for n in _ordered_names()
        if QUERIES[n].oracle is not None
    }
