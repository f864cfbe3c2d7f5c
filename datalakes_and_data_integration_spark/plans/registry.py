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
# WINDOW_ROUND. Round-6 window: the 4 ANN queries changed this round
# (scaled PQ shortlist budget; shared training-sample constant), the 3
# round-6 newcomers (curation5.py — never verified, so clause (a) by
# definition), the lsh_bucketed spread fix, the 15 text-family spread
# fixes from the third session (8 direct + 7 text_quality_score
# composers), the 2 reversed-order fill rewrites (gapfill interpolate +
# ffill_bfill), the 3 hybrid-kernel swaps (knn/mrr/hard-negatives),
# and the 22 alphabetically-first queries of the round-1 cohort.
# 8 + 20 + 22 = 50; the 21 yielded round-1 names (topn_orders_per_
# customer, the tpch tail from q10 on, union_dedup_events,
# user_first_last_event, value_histogram_by_type,
# value_percentiles_by_type) head the round-7 oldest cohort ahead of
# the round-2 cohort.
WINDOW_ROUND = 6  # the driver round this window was built for
ROUND_CHANGED: list[str] = [
    # policy clause (a): code changed since the newest green row
    "ann_topk_pq",
    "ann_topk_ivfadc",
    "ann_topk_ivfadc_residual",
    "ann_topk_ivf",
    # round-6 newcomers: no green row exists yet
    "ann_retrieval_quality_report",
    "split_decontamination_report",
    "dedup_tier_overlap_report",
    # spread() added to the bucket self-join input (plan change, same rows)
    "ann_topk_lsh_bucketed",
    # round-6 third session: the dedup-ladder probe's noop-sink timing fix
    # exposed single-input-split serialization of the scan-side tokenize/
    # regex/rolling-hash work (count() had let Catalyst prune it); spread()
    # added to these eight (plan change, same rows) ...
    "doc_fingerprint",
    "text_token_stats",
    "text_lang_id",
    "text_quality_score",
    "text_pii_mask",
    "lang_confusion_matrix",
    "vocab_zipf_stats",
    "tokenizer_fertility_by_lang",
    # ... and these seven compose text_quality_score, so their executed
    # plans changed too (the round-5 sampled-training precedent: every
    # query whose plan a helper change reaches gets a fresh driver row).
    "quality_vs_duplication",
    "weighted_sample_quality",
    "training_corpus_manifest",
    "quality_quantile_normalization",
    "token_weighted_quality_quantile",
    "mannwhitney_quality_en_vs_rest",
    "spearman_quality_length",
    # round-6 third session, events ladder: next-neighbor fills rewritten
    # from first(ignorenulls) over current-row->unbounded-following frames
    # (Spark re-scans the partition tail per row — O(n x partition)) to a
    # running last(ignorenulls) over the reversed total order (same rows,
    # 9.2x measured at the 1m-event decade).
    "gapfill_hourly_interpolate",
    "ffill_bfill",
    # round-6 third session, ML ladder: the three eval reports now
    # compose the hybrid exact kernel (identical top-5, block-wise cost
    # — the bare-BNLJ baseline stays the truth anchor for the recall
    # audits only).
    "knn_classifier_eval",
    "ann_label_mrr",
    "ann_hard_negatives",
]
WINDOW_PRIORITY: list[str] = [
    "ann_topk_pq",
    "ann_topk_ivfadc",
    "ann_topk_ivfadc_residual",
    "ann_topk_ivf",
    "ann_topk_lsh_bucketed",
    "ann_retrieval_quality_report",
    "split_decontamination_report",
    "dedup_tier_overlap_report",
    "doc_fingerprint",
    "text_token_stats",
    "text_lang_id",
    "text_quality_score",
    "text_pii_mask",
    "lang_confusion_matrix",
    "vocab_zipf_stats",
    "tokenizer_fertility_by_lang",
    "quality_vs_duplication",
    "weighted_sample_quality",
    "training_corpus_manifest",
    "quality_quantile_normalization",
    "token_weighted_quality_quantile",
    "mannwhitney_quality_en_vs_rest",
    "spearman_quality_length",
    "gapfill_hourly_interpolate",
    "ffill_bfill",
    "knn_classifier_eval",
    "ann_label_mrr",
    "ann_hard_negatives",
    "anti_join_inactive_customers",
    "asof_join_last_click",
    "cheapest_part_per_size",
    "cohort_retention",
    "conversion_funnel",
    "daily_event_type_set",
    "dau_by_nation",
    "distinct_users_per_day",
    "events_pivot_daily_by_type",
    "full_outer_merge_events",
    "json_props_extract",
    "lineitem_unpivot_measures",
    "orders_grouping_sets",
    "orders_rollup",
    "pk_dedup_first_writer",
    "range_join_views_before_purchase",
    "referential_integrity_check",
    "semi_join_big_spenders",
    "set_ops_user_cohorts",
    "supplier_diversity_by_brand",
    "table_profile_lineitem",
    "top_customers_by_revenue",
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
