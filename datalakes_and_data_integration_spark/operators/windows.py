"""Ordered window operators (reference W1/W2/W4).

The reference computes 6-step lag features by *positional* shift over the
whole merged pandas frame (`/root/reference/src/process_to_curated.py:
109-157`), admitting in comments that this is only "6 hours" if rows are
hourly, gap-free, and sorted per site. Its "faster" variant even wraps
around via ``np.roll`` (`faster_process_to_curated.py:136-139`) — a bug, not
a behavior (SURVEY.md §2.5 W3). The rebuild implements the *intended*
semantics: per-key, time-ordered windows with an explicit total order.

Scale: one shuffle on the partition key per distinct window spec; all four
operators below share a spec, so a pipeline applying them together shuffles
once. Skewed partition keys are the limit (windows bypass AQE skew
handling); keys here are site/user grain, which is high-cardinality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


def ordered_window(partition_by: Sequence[str], order_by: Sequence) -> WindowSpec:
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def lag_diff(value: str | Column, w: WindowSpec, n: int = 6) -> Column:
    """``value - lag(value, n)`` with the reference's fillna: rows within the
    first ``n`` positions diff against themselves -> 0 (W1,
    `process_to_curated.py:123-129`)."""
    v = F.col(value) if isinstance(value, str) else value
    return v - F.coalesce(F.lag(v, n).over(w), v)


def lag_pct_change(value: str | Column, w: WindowSpec, n: int = 6) -> Column:
    """``(value - lag(value, n)) / lag(value, n) * 100``; first ``n`` rows
    null — the reference applies no fillna here (W2,
    `process_to_curated.py:148-152`)."""
    v = F.col(value) if isinstance(value, str) else value
    prev = F.lag(v, n).over(w)
    return (v - prev) / prev * 100


def ffill(value: str | Column, w: WindowSpec) -> Column:
    """Forward-fill: last non-null up to the current row (W4)."""
    v = F.col(value) if isinstance(value, str) else value
    return F.last(v, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )


def bfill(value: str | Column, w: WindowSpec) -> Column:
    """Backward-fill: first non-null from the current row on (W4)."""
    v = F.col(value) if isinstance(value, str) else value
    return F.first(v, ignorenulls=True).over(
        w.rowsBetween(0, Window.unboundedFollowing)
    )
