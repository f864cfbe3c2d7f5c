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

# Importing these modules populates the registry. Since round 3 the driver's
# 50-query verification window is controlled by registry.WINDOW_PRIORITY
# (an explicit name list reordered in all_queries()), not by import order —
# rotate that list each round to retire verification debt; import order
# below only affects the post-window tail.
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
    curation3,
    curation4,
    curation5,
    curation6,
    curation7,
    curation8,
    experiment,
)

__all__ = ["QUERIES", "Query", "all_queries", "all_oracle_sql", "register"]
