"""Data-layout operators: multi-dimensional clustering (Z-order).

The reference's Cassandra clustering gives time-locality within a site
(`PRIMARY KEY (code_site, date_de_debut)` — preprocess_to_staging.py:
107-108); at lakehouse scale the analogue is sorting files so that
parquet row-group min/max stats prune multi-dimensional predicates —
Delta's OPTIMIZE ZORDER BY, built here from primitives:

1. rank each clustering column to a bounded integer (value -> ntile
   bucket, so skew and type don't matter);
2. interleave the bucket bits (Morton code) with native bit expressions;
3. range-partition + sort by the code, one file per partition.

A query filtering on ANY clustered column touches a fraction of the
files, because nearby codes are nearby in every dimension.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BITS = 8  # buckets per dimension = 256


def morton_code(cols: Sequence[str], bits: int = _BITS):
    """Interleaved-bit (Morton) code over per-column ntile buckets.

    Returns a Column; requires the ``__bucket_{c}`` columns produced by
    ``zorder_layout`` (ntile ranks in [0, 2^bits)).
    """
    parts = []
    for b in range(bits):
        for i, c in enumerate(cols):
            shift = b * len(cols) + i
            parts.append(
                f"(shiftleft(shiftright(__bucket_{c}, {b}) & 1, {shift}))"
            )
    return F.expr("CAST(" + " + ".join(parts) + " AS BIGINT)")


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    n_files: int = 8,
    bits: int = _BITS,
) -> DataFrame:
    """Return ``df`` re-ordered for a Z-order write: range-partitioned and
    sorted by the Morton code of ``cols``. Write with
    ``.write.parquet(path)`` and every output file covers a narrow range of
    EVERY clustering column."""
    out = df
    for c in cols:
        w = Window.orderBy(F.col(c).asc_nulls_last())
        out = out.withColumn(
            f"__bucket_{c}", F.ntile(2**bits).over(w) - 1
        )
    out = out.withColumn("__z", morton_code(cols, bits))
    return (
        out.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__bucket_{c}" for c in cols])
    )
