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
# verification debt. Round-5 window (the "ROUND 5 WINDOW (definitive)"
# list pinned in NOTES.md at the end of round 4): the 43 queries still
# lacking a driver CORRECTNESS row from any round — the streaming state
# suite, the residual/multiprobe ANN tail, both re-oracled ex-rows-only
# queries (approx_stats_scale_path, label_cov_top_eigen), both
# round-4-changed temporal queries, and the remaining temporal/relational
# long tail — plus 7 spare slots re-verifying this round's
# behavior-adjacent greens (the sampled-training/array-ADC ANN family and
# early-round anchors). After CORRECTNESS_r05 the never-driver-verified
# set is empty. Every name here carries an oracle, so no window slot is a
# guaranteed rows-only `err`; the remaining no-oracle queries land behind
# position 50 automatically. Validated by tests/test_registry_window.py.
WINDOW_PRIORITY: list[str] = [
    # --- the 43 never-driver-verified queries (NOTES.md r4 #6) ---
    "ann_hard_negatives",
    "ann_topk_ivfadc_residual",
    "ann_topk_lsh_multiprobe",
    "approx_stats_scale_path",
    "bpe_encode_token_stats",
    "centroid_classifier_eval",
    "conversion_latency_quantiles",
    "dau_new_returning_resurrected",
    "dedup_savings_report",
    "doc_corpus_quality_report",
    "event_sequence_pattern",
    "functional_dependency_profile",
    "gapfill_hourly_interpolate",
    "gopher_quality_rules",
    "holt_linear_forecast",
    "inclusion_dependency_profile",
    "knn_classifier_eval",
    "label_cov_top_eigen",
    "lineitem_correlation_matrix",
    "logreg_calibration_bins",
    "mannwhitney_quality_en_vs_rest",
    "market_basket_lift",
    "multimodal_cdc_chunking",
    "ohlc_hourly_bars",
    "props_key_drift",
    "rfm_customer_segments",
    "rolling_distinct_hll_7d",
    "seasonal_adjusted_anomaly",
    "session_bounce_rate_daily",
    "shipping_delay_profile",
    "spearman_quality_length",
    "split_balance_audit",
    "streaming_cusum_alerts",
    "streaming_dedup_within_watermark",
    "streaming_stream_stream_left_join",
    "temperature_mixture_plan",
    "temporal_split_audit",
    "term_domain_signature",
    "token_weighted_quality_quantile",
    "top_user_journeys",
    "twap_hourly",
    "value_dod_wow_report",
    "vocab_coverage_curve",
    # --- 7 spare slots: re-verify behavior-adjacent greens. ann_topk_pq /
    # ann_topk_ivfadc replaced the r1/r2-verified mean_impute /
    # full_outer_merge_events spares at round-5 start: both were CHANGED
    # after their r4 green rows (array-ADC restructure + sampled k-means
    # training), so they need fresh driver evidence more than untouched
    # early-round anchors do. ---
    "ann_topk_pq",
    "ann_topk_ivfadc",
    "ann_topk_bruteforce_hybrid",
    "ann_topk_lsh_bucketed",
    "ann_topk_ivf",
    "heavy_hitters_cms",
    "dedup_exact",
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
