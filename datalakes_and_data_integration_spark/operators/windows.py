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


def bfill_rev(value: str | Column, w_rev: WindowSpec) -> Column:
    """Backward-fill: first non-null from the current row on (W4).

    ``w_rev`` must be the EXACT REVERSE of the ffill spec (every order
    key flipped, nulls_last -> nulls_first), over a total order. The
    fill is computed as a running ``last(ignorenulls)`` over the
    reversed order instead of ``first(ignorenulls)`` over a
    current-row -> unbounded-following frame: Spark evaluates
    unbounded-following frames by re-scanning the rest of the partition
    for EVERY row — O(rows x partition size), measured 108 s vs 11.7 s
    on a 9.2M-row spine (round-6 events ladder) — while an
    unbounded-preceding frame is an O(rows) running accumulator. Same
    rows, same values; only the frame direction changes.
    """
    v = F.col(value) if isinstance(value, str) else value
    return F.last(v, ignorenulls=True).over(
        w_rev.rowsBetween(Window.unboundedPreceding, 0)
    )
