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
# verification debt. Round-3 window (see VERDICT.md round 2, "Next round"
# #1/#2/#4): the r1-err + r2-hash-fail queries that were just fixed, the 15
# oracles repaired by the arrow-type audit, the two newly-oracled queries
# (ann_topk_ivf, multimodal_audio_features), and 30 of the 72 queries no
# driver round has ever checked. Every name here carries an oracle, so no
# window slot is a guaranteed rows-only `err`; the remaining no-oracle
# queries land behind position 50 automatically. Names are validated
# against the registry by tests/test_registry_window.py.
WINDOW_PRIORITY: list[str] = [
    # r1 driver `err`, fixed in r2 — must clear the record
    "typed_cast_null_on_error",
    # r2 hash-fails — DuckDB HUGEINT sums, cast in round 3
    "doc_stats_cube",
    "sequence_packing",
    "vocab_zipf_stats",
    "sessionization",
    # latent HUGEINT oracles found by the round-3 arrow-type audit
    "winsorized_stats_by_type",
    "join_key_skew_report",
    "boxplot_stats_by_type",
    "props_schema_profile",
    "seasonality_profile",
    "source_mixture_weights",
    "feature_hashing",
    "quality_vs_duplication",
    "tokenizer_fertility_by_lang",
    "heavy_hitters_cms",
    "bloom_prefilter_audit",
    "pagerank_dup_hubs",
    "ks_drift_n_chars",
    # newly oracle-backed in round 3 (were rows-only `err` slots in r2)
    "ann_topk_ivf",
    "multimodal_audio_features",
    # never driver-verified, highest-value first (capstone + suites)
    "training_corpus_manifest",
    "dedup_cluster_largestar",
    "distinct_count_hll",
    "hll_set_algebra",
    "logreg_gd_weights",
    "logreg_confusion",
    "logreg_holdout_eval",
    "logreg_multihead_weights",
    "ngram_lm_perplexity",
    "data_quality_report",
    "quarantine_audit",
    "streaming_quality_report",
    "k_anonymity_audit",
    "ann_lsh_recall_audit",
    "salted_join_user_profile",
    "fuzzy_name_match",
    "session_window_native",
    "rolling_zscore_anomaly",
    "ewma_smoothing",
    "benchmark_ngram_contamination",
    "interdoc_duplicate_ngrams",
    "cross_source_neardup_rate",
    "dup_cluster_size_distribution",
    "sketch_agreement_audit",
    "streaming_static_enrich",
    "streaming_threshold_alerts",
    "chi2_lang_source",
    "psi_drift_n_chars",
    "split_leakage_audit",
    "neardup_triangle_count",
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
