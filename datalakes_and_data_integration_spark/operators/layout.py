"""Data-layout operators: multi-dimensional clustering (Z-order).

The reference's Cassandra clustering gives time-locality within a site
(`PRIMARY KEY (code_site, date_de_debut)` — preprocess_to_staging.py:
107-108); at lakehouse scale the analogue is sorting files so that
parquet row-group min/max stats prune multi-dimensional predicates —
Delta's OPTIMIZE ZORDER BY, built here from primitives:

1. rank each clustering column to a bounded integer bucket. Boundaries
   come from a DISTRIBUTED quantile sketch (``approxQuantile``, numeric /
   temporal) or a bounded deterministic sample (other orderable types) —
   never from a global ``Window.orderBy``, which would funnel the whole
   dataset through one task. The boundaries land in the plan as literals,
   so bucket assignment is a narrow map over the scan;
2. interleave the bucket bits (Morton code) with native bit expressions;
3. range-partition + sort by the code, one file per partition.

A query filtering on ANY clustered column touches a fraction of the
files, because nearby codes are nearby in every dimension. NULLs sort
into bucket 0 (first), a documented divergence from the previous
nulls-last ntile ranking — Z-order has no inherent null position.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 8  # buckets per dimension = 256
_SAMPLE_TARGET = 100_000  # rows sampled per non-sketchable column


def _bucket_boundaries(df: DataFrame, c: str, n_buckets: int) -> list:
    """Sorted, deduplicated interior boundaries (<= n_buckets - 1 values)."""
    dt = dict(df.dtypes)[c]
    probs = [i / n_buckets for i in range(1, n_buckets)]
    if dt in ("tinyint", "smallint", "int", "bigint", "float", "double",
              "timestamp", "timestamp_ntz") or dt.startswith("decimal"):
        # Greenwald-Khanna sketch: one distributed pass, tiny driver state.
        qdf = df.select(F.col(c).cast("double").alias("__q")).na.drop()
        bounds = qdf.stat.approxQuantile("__q", probs, 0.001)
    else:
        # Orderable but unsketchable (strings, dates): quantiles of a
        # bounded deterministic sample — the RangePartitioner strategy.
        vals = df.select(c).na.drop()
        n = vals.count()
        if n == 0:
            return []
        frac = min(1.0, _SAMPLE_TARGET / n)
        sample = sorted(
            # scale-ok: sample bounded by _SAMPLE_TARGET rows
            r[0] for r in vals.sample(False, frac, seed=42).collect()
        )
        if not sample:
            return []
        bounds = [
            sample[min(len(sample) - 1, int(p * len(sample)))] for p in probs
        ]
    out: list = []
    for b in bounds:
        if not out or b > out[-1]:
            out.append(b)
    return out


def _bucket_col(df: DataFrame, c: str, n_buckets: int) -> Column:
    """Map ``c`` to a bucket id in [0, n_buckets) by counting boundary
    crossings — a codegen-friendly sum of comparisons against literal
    boundaries (255 adds for 8 bits), no shuffle, no window."""
    bounds = _bucket_boundaries(df, c, n_buckets)
    dt = dict(df.dtypes)[c]
    numericish = dt in (
        "tinyint", "smallint", "int", "bigint", "float", "double",
        "timestamp", "timestamp_ntz",
    ) or dt.startswith("decimal")
    base = F.col(c).cast("double") if numericish else F.col(c)
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(base > F.lit(b), 1).otherwise(0)
    return bucket.cast("int")


def morton_code(cols: Sequence[str], bits: int = _BITS):
    """Interleaved-bit (Morton) code over per-column buckets.

    Returns a Column; requires the ``__bucket_{c}`` columns produced by
    ``zorder_layout`` (bucket ranks in [0, 2^bits)).
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
        out = out.withColumn(f"__bucket_{c}", _bucket_col(df, c, 2**bits))
    out = out.withColumn("__z", morton_code(cols, bits))
    return (
        out.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__bucket_{c}" for c in cols])
    )
