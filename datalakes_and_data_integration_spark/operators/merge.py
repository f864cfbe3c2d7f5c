"""Wide-merge operators (reference J1 / P5 / P6).

The reference's curated stage left-folds ``pd.merge(..., how='outer')`` over
one DataFrame per pollutant table after prefix-renaming every non-key column
(`/root/reference/src/process_to_curated.py:167,170-171,176-186`).

Spark restatement: a chained full-outer equi-join on the key columns. With N
inputs this is N-1 shuffles on the same key — so we repartition each input by
the key once and let Spark reuse the exchange; AQE handles the rest. For very
wide N, the equivalent union+pivot form (one shuffle) is exposed by the
pivot-based queries in plans/relational.py.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drop_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Drop columns if present (reference drops date_de_fin/polluant)."""
    present = [c for c in cols if c in df.columns]
    return df.drop(*present) if present else df


def prefix_columns(df: DataFrame, prefix: str, keys: Sequence[str]) -> DataFrame:
    """Rename every non-key column to ``{prefix}_{col}``."""
    return df.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"{prefix}_{c}") for c in df.columns if c not in keys],
    )


def full_outer_merge(dfs: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """Left-fold full-outer join on ``keys`` (join-column coalescing form)."""
    if not dfs:
        raise ValueError("need at least one DataFrame")
    return reduce(lambda a, b: a.join(b, list(keys), "full"), dfs)
