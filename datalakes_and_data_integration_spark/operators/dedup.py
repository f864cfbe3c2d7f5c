"""Deduplication operators (reference A1 / A2 / S15).

- Full-row distinct: the reference keeps a ``set`` of row tuples per pollutant
  (`/root/reference/src/preprocess_to_staging.py:171,193-197`; thread-safe
  variant `faster_preprocess_to_staging.py:185-216`).
- Key dedup: Cassandra ``INSERT ... IF NOT EXISTS`` silently drops later rows
  with a duplicate primary key — first-writer-wins, where "first" is S3
  listing order (`preprocess_to_staging.py:140`). That order is unspecified,
  so the rebuild makes the tiebreak explicit (SURVEY.md §7.4): the caller
  names the ordering columns and we keep ``row_number() == 1``.

Scale: both are a single hash-shuffle on the dedup key. ``dedup_keep_first``
shuffles on the key columns only (window partition), so skew on a hot key is
the thing to watch — AQE skew-join handling does not apply to windows, so at
100 TB prefer a high-cardinality key set or pre-salt + two-phase min.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_full_row(df: DataFrame) -> DataFrame:
    """DISTINCT over all columns — one shuffle with map-side combine."""
    return df.dropDuplicates()


def dedup_keep_first(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence,
) -> DataFrame:
    """Keep exactly one row per ``keys``: the first under ``order_by``.

    Deterministic replacement for the reference's first-writer-wins LWT
    insert. ``order_by`` must be a total order within a key group (include a
    unique id last).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
