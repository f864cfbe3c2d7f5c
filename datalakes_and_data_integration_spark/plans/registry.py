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
# round, so the window is rotated explicitly each round to retire
# verification debt. Round-4 window (the "ROUND 4 definitive list" pinned
# in NOTES.md at the end of round 3, executed per VERDICT.md round 3
# "Next round" #1): the 50 oracled queries no driver round has ever
# verified — the PQ/IVFADC ANN scale path, both rows-only companions
# (exact_quantiles_two_pass, label_cov_power_iteration), the streaming
# state suite's oracled members, and the temporal/relational long tail.
# Every name here carries an oracle, so no window slot is a guaranteed
# rows-only `err`; the remaining no-oracle queries land behind position 50
# automatically. Names are validated by tests/test_registry_window.py.
WINDOW_PRIORITY: list[str] = [
    "multimodal_phash_neardup",
    "benford_first_digit",
    "catalog_null_audit",
    "market_basket_brand_pairs",
    "geo_revenue_rollup",
    "discount_quantity_correlation",
    "window_rank_family",
    "event_transition_matrix",
    "time_decayed_popularity",
    "trend_slope_by_type",
    "revenue_pareto",
    "interevent_gap_stats",
    "event_burstiness_fano",
    "value_autocorrelation_lag1",
    "label_centroids",
    "embedding_quantization_error",
    "weighted_sample_quality",
    "streaming_incremental_dedup",
    "snapshot_diff_events",
    "contrastive_negative_pairs",
    "completeness_hourly_report",
    "source_lang_entropy",
    "embedding_norm_stats",
    "label_centroid_distances",
    "label_cov_moments",
    "ann_topk_pq",
    "ann_topk_ivfadc",
    "doc_rarity_score",
    "vocab_growth_curve",
    "event_debounce",
    "quality_quantile_normalization",
    "continuous_aggregate_daily",
    "pivot_unpivot_roundtrip",
    "skew_salted_join_stats",
    "passage_dedup_rewrite",
    "dedup_containment_pairs",
    "cusum_changepoint",
    "embedding_random_projection",
    "kcore_dup_graph",
    "exact_quantiles_two_pass",
    "quota_sample_apportionment",
    "robust_scaling_mad",
    "label_cov_power_iteration",
    "ann_label_mrr",
    "cluster_aware_split",
    "balanced_batch_assignment",
    "streaming_cusum_changepoint",
    "l_diversity_audit",
    "corpus_snapshot_stats",
    "bpe_merge_learning",
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
