"""Declared query inventory.

Every operator claimed in SURVEY.md §2 (plus the training-data-pipeline
extensions) is exposed here as a named query: a Spark callable
``(spark, sf_dir) -> DataFrame`` and, where SQL-expressible, a matching
ANSI-SQL oracle that DuckDB runs on the same parquet tables. The driver
hash-compares the two at sf=0.01 — this registry IS the correctness surface.
"""

from datalakes_and_data_integration_spark.plans.registry import (
    QUERIES,
    Query,
    all_queries,
    all_oracle_sql,
    register,
)

# Importing these modules populates the registry. ORDER MATTERS: the driver
# verifies the first 50 entries of ``all_queries()`` against the oracles, so
# the suites that were driver-unreached in round 1 (dedup / similarity / text /
# multimodal / streaming / timeseries — see VERDICT.md "Next round #1")
# register first; the 45 tpch/relational/temporal queries that already earned
# green CORRECTNESS_r01 rows take the back seats this round.
from datalakes_and_data_integration_spark.plans import (  # noqa: E402,F401
    dedup,
    similarity,
    text,
    multimodal,
    streaming_queries,
    timeseries,
    tpch,
    relational,
    temporal,
    curation,
    streaming_extra,
    sketches,
    graph,
    drift,
    similarity_extra,
    curation2,
    maintenance,
    quality,
    lm,
    ml,
)

__all__ = ["QUERIES", "Query", "all_queries", "all_oracle_sql", "register"]
