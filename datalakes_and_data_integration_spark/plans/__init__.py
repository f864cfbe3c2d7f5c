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

# Importing these modules populates the registry.
from datalakes_and_data_integration_spark.plans import (  # noqa: E402,F401
    tpch,
    relational,
    temporal,
    timeseries,
    dedup,
    similarity,
    text,
    multimodal,
    streaming_queries,
)

__all__ = ["QUERIES", "Query", "all_queries", "all_oracle_sql", "register"]
