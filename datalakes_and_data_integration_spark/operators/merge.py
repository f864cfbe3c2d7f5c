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
    """Left-fold full-outer join on ``keys``, null-safe.

    NULL-SAFE equality (<=>) matters for parity: pandas ``merge`` matches
    NaN keys to each other (reference J1 merges rows whose date failed to
    parse), and SQL GROUP BY groups nulls — plain join equality would
    instead emit one unmatched row per side. ``outer_merge_pivot`` gets the
    same semantics for free from GROUP BY.

    Shuffle note: the coalesced key projection between fold steps erases
    output partitioning, so every step re-shuffles (plan audit shows 13
    exchanges for 5 inputs). Fine at small N; for wide N or network-bound
    clusters use ``outer_merge_pivot`` — ONE shuffle, identical result
    including null-key grouping.
    """
    if not dfs:
        raise ValueError("need at least one DataFrame")
    keys = list(keys)

    def step(left: DataFrame, right: DataFrame) -> DataFrame:
        la, rb = left.alias("l"), right.alias("r")
        cond = reduce(
            lambda acc, k: acc & F.col(f"l.{k}").eqNullSafe(F.col(f"r.{k}")),
            keys[1:],
            F.col(f"l.{keys[0]}").eqNullSafe(F.col(f"r.{keys[0]}")),
        )
        joined = la.join(rb, cond, "full")
        return joined.select(
            *[
                F.coalesce(F.col(f"l.{k}"), F.col(f"r.{k}")).alias(k)
                for k in keys
            ],
            *[F.col(f"l.{c}") for c in left.columns if c not in keys],
            *[F.col(f"r.{c}") for c in right.columns if c not in keys],
        )

    return reduce(step, dfs)


def outer_merge_pivot(dfs: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """Single-shuffle equivalent of ``full_outer_merge`` for inputs whose
    non-key columns are disjoint (the prefixed per-pollutant tables).

    The join-fold form shuffles the widening table at every step — the
    coalesced join keys erase the partitioning info, so N inputs cost N-1
    re-shuffles of ever-wider rows (observed: 8 exchanges for 5 inputs).
    Here every input is padded to the union schema with null columns,
    unioned, and grouped ONCE on the keys; per (key, column) at most one
    input contributes a non-null value (keys are unique within each silver
    table), so ``any_value(ignorenulls)`` reassembles the wide row exactly.

    100 TB: one hash shuffle of the tall union, map-side combined — the
    shuffle carries mostly-null narrow rows that combine into wide rows
    before hitting the network.
    """
    if not dfs:
        raise ValueError("need at least one DataFrame")
    keys = list(keys)
    value_cols: list[str] = []
    types: dict[str, str] = {}
    for df in dfs:
        for field in df.schema.fields:
            if field.name not in keys and field.name not in types:
                value_cols.append(field.name)
                types[field.name] = field.dataType.simpleString()
    padded = [
        df.select(
            *[F.col(k) for k in keys],
            *[
                (
                    F.col(c)
                    if c in df.columns
                    else F.lit(None).cast(types[c])
                ).alias(c)
                for c in value_cols
            ],
        )
        for df in dfs
    ]
    tall = reduce(lambda a, b: a.unionByName(b), padded)
    return tall.groupBy(*keys).agg(
        *[F.any_value(c, ignoreNulls=True).alias(c) for c in value_cols]
    )


def snapshot_diff(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Classify every key across two table snapshots: 'added' (new only),
    'removed' (old only), 'changed' (both, any non-key column differs),
    'unchanged'. The CDC primitive for lakes without a table format —
    one full outer join on the key, change detection via null-safe
    comparison of the remaining columns (md5 of a canonical struct would
    also work; direct comparison avoids hashing wide rows).

    Scale: one shuffle on the key for the join; both sides prune to
    key + compared columns at the scan.
    """
    non_keys = [c for c in old.columns if c not in keys]
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in non_keys],
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in non_keys],
    )
    cond = None
    for k in keys:
        e = F.col(f"__ko_{k}") == F.col(f"__kn_{k}")
        cond = e if cond is None else cond & e
    j = o.join(n, cond, "full_outer")
    in_old = F.col(f"__ko_{keys[0]}").isNotNull()
    in_new = F.col(f"__kn_{keys[0]}").isNotNull()
    same = None
    for c in non_keys:
        e = F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        same = e if same is None else same & e
    if same is None:
        same = F.lit(True)
    change = (
        F.when(~in_old, "added")
        .when(~in_new, "removed")
        .when(same, "unchanged")
        .otherwise("changed")
    )
    key_cols = [
        F.coalesce(F.col(f"__ko_{k}"), F.col(f"__kn_{k}")).alias(k)
        for k in keys
    ]
    return j.select(*key_cols, change.alias("change_type"))
