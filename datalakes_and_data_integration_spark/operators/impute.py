"""Mean imputation (reference A3 / F6).

The reference computes each numeric column's global mean over the merged
frame and fills nulls with it (`/root/reference/src/process_to_curated.py:
98-106`) — notably *before* unit conversion, an ordering that is observable
in outputs and preserved by the gold pipeline (SURVEY.md §7.4).

The mean is a global (ungrouped) aggregate: one map-side-combined pass, a
few bytes per column to the driver, then a literal in the fill projection —
no second shuffle. For hash-exactness with SQL oracles the mean is computed
as an exact DECIMAL sum divided by the count in double arithmetic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mean_exprs(
    cols: Sequence[str], precision: tuple[int, int] = (25, 6)
) -> list:
    """The exact-decimal global-mean aggregate for each column (sum in
    DECIMAL so the result is order/partition-independent, divided by the
    non-null count in double)."""
    p, s = precision
    return [
        (
            F.sum(F.col(c).cast(f"decimal({p},{s})")).cast("double")
            / F.count(F.col(c))
        ).alias(c)
        for c in cols
    ]


def fill_with_means(df: DataFrame, means: dict) -> DataFrame:
    """Narrow projection filling each column's nulls with its
    pre-computed mean literal."""
    return df.select(
        *[
            F.coalesce(F.col(c), F.lit(means[c])).alias(c)
            if c in means
            else F.col(c)
            for c in df.columns
        ]
    )


def impute_mean(
    df: DataFrame,
    cols: Sequence[str],
    precision: tuple[int, int] = (25, 6),
) -> DataFrame:
    """Fill nulls in each of ``cols`` with that column's global mean.

    One aggregate job computes all means at once; the fill itself is a
    narrow projection. When ``df`` is expensive to evaluate (a join
    chain), compute the means on the cheap upstream inputs instead and
    apply ``fill_with_means`` — see pipeline/gold.py.
    """
    aggs = mean_exprs(cols, precision)
    means = df.agg(*aggs).collect()[0].asDict()  # scale-ok: 1-row global means
    return fill_with_means(df, means)
