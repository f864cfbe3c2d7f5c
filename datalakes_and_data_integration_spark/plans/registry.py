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


def all_queries() -> dict[str, SparkQuery]:
    return {name: q.spark for name, q in QUERIES.items()}


def all_oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
