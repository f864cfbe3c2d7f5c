"""Declarative data-quality expectations (Deequ/Great-Expectations-style).

The reference enforces data quality imperatively and destructively:
empty-row and header-mismatch rows are silently dropped in staging
(preprocess_to_staging.py:65-87), unmapped units become nulls in curated
(process_to_curated.py:96-104). An auditable lake wants the other shape:
declare constraints, measure violations, and report — without mutating
the data. This module is that layer.

Check classes:

- predicate checks (``not_null``, ``between``, ``isin``, custom SQL
  predicate) — compiled into ONE aggregation pass per table: each check
  is a conditional-sum column over the same scan, so adding a tenth
  check to a 100 TB table costs zero extra reads. The wide one-row
  result is unpivoted back to one row per check.
- ``unique`` — one map-side-combined groupBy on the key; both the total
  row count and the duplicate count come from the same shuffle
  (sum(cnt) / sum(cnt-1 where cnt>1)), no second scan.
- ``foreign_key`` — fact keys are pre-aggregated to (key, count), then
  probed against the dim's distinct keys with a left join; by default
  AQE picks the strategy (broadcast when the dim turns out small),
  ``broadcast_dim=True`` forces the hint for a dim the caller knows is
  tiny; orphan rows are counted without ever shuffling fact rows.

Every check yields the same row shape
``(table_name, check_name, n_checked, n_violations, passed)`` so suites
union cleanly into one report.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REPORT_COLS = ("table_name", "check_name", "n_checked", "n_violations", "passed")


@dataclass
class _PredicateCheck:
    name: str
    violated: Column  # boolean: true == row violates the expectation


class ExpectationSuite:
    """Collect expectations for one table, then ``run()`` the report."""

    def __init__(self, df: DataFrame, table_name: str):
        self._df = df
        self._table = table_name
        self._predicates: list[_PredicateCheck] = []
        self._extra_reports: list[DataFrame] = []

    # -- predicate checks (fused into one scan) -------------------------

    def expect_not_null(self, col: str) -> "ExpectationSuite":
        return self._pred(f"{col}_not_null", F.col(col).isNull())

    def expect_between(self, col: str, lo, hi) -> "ExpectationSuite":
        """Range check; nulls don't violate (pair with expect_not_null)."""
        c = F.col(col)
        return self._pred(
            f"{col}_between_{lo}_{hi}",
            c.isNotNull() & ~c.between(lo, hi),
        )

    def expect_in(self, col: str, values) -> "ExpectationSuite":
        c = F.col(col)
        return self._pred(
            f"{col}_accepted_values",
            c.isNotNull() & ~c.isin(*values),
        )

    def expect_predicate(self, name: str, holds: Column) -> "ExpectationSuite":
        """Custom predicate that must hold on every row."""
        return self._pred(name, ~holds)

    def _pred(self, name: str, violated: Column) -> "ExpectationSuite":
        if any(p.name == name for p in self._predicates):
            raise ValueError(
                f"duplicate check name {name!r} in suite {self._table!r} — "
                "names must be unique (they become aggregate column names "
                "in the fused one-scan report)"
            )
        self._predicates.append(_PredicateCheck(name, violated))
        return self

    # -- checks that need their own shuffle ------------------------------

    def expect_unique(self, *cols: str) -> "ExpectationSuite":
        name = "_".join(cols) + "_unique"
        per_key = self._df.groupBy(*cols).agg(F.count("*").alias("__cnt"))
        rep = per_key.agg(
            F.coalesce(F.sum("__cnt"), F.lit(0)).alias("n_checked"),
            F.coalesce(
                F.sum(F.when(F.col("__cnt") > 1, F.col("__cnt") - 1)),
                F.lit(0),
            ).alias("n_violations"),
        ).select(
            F.lit(self._table).alias("table_name"),
            F.lit(name).alias("check_name"),
            "n_checked",
            "n_violations",
        )
        self._extra_reports.append(rep)
        return self

    def expect_foreign_key(
        self,
        col: str,
        dim: DataFrame,
        dim_col: str,
        dim_name: str,
        broadcast_dim: bool = False,
    ) -> "ExpectationSuite":
        """Referential integrity: every non-null ``col`` exists in
        ``dim.dim_col``. Null keys are not orphans (SQL FK semantics).

        ``broadcast_dim=True`` forces a broadcast hint for a dim the
        caller knows is tiny; the default leaves the join strategy to
        AQE, which broadcasts when the (distinct-key) dim side turns out
        small — an unconditional hint would force-collect a large
        dimension and OOM at the scales this module targets."""
        name = f"{col}_fk_{dim_name}_{dim_col}"
        fact_keys = (
            self._df.filter(F.col(col).isNotNull())
            .groupBy(F.col(col).alias("__k"))
            .agg(F.count("*").alias("__cnt"))
        )
        dim_keys = (
            dim.select(F.col(dim_col).alias("__k")).distinct().withColumn(
                "__hit", F.lit(1)
            )
        )
        if broadcast_dim:
            dim_keys = F.broadcast(dim_keys)
        rep = (
            fact_keys.join(dim_keys, "__k", "left")
            .agg(
                F.coalesce(F.sum("__cnt"), F.lit(0)).alias("n_checked"),
                F.coalesce(
                    F.sum(F.when(F.col("__hit").isNull(), F.col("__cnt"))),
                    F.lit(0),
                ).alias("n_violations"),
            )
            .select(
                F.lit(self._table).alias("table_name"),
                F.lit(name).alias("check_name"),
                "n_checked",
                "n_violations",
            )
        )
        self._extra_reports.append(rep)
        return self

    # -- quarantine (dead-letter split) ----------------------------------

    def quarantine(self) -> tuple[DataFrame, DataFrame]:
        """Split rows on the suite's PREDICATE checks (the row-local ones;
        unique/FK express dataset-level facts and don't name a single bad
        row). Returns ``(passing, quarantined)`` where quarantined rows
        carry a ``violations`` column: the comma-joined, alphabetically
        ordered names of every failed check — the dead-letter pattern, so
        bad rows are rerouted with machine-readable reasons instead of
        silently dropped (the reference's shape,
        preprocess_to_staging.py:65-87).

        One scan, no shuffle: the reason string is a narrow projection and
        the split is two filters over it; with both outputs consumed the
        scan runs twice (or once if the caller persists the tagged frame) —
        either way nothing is collected or exchanged.
        """
        checks = sorted(self._predicates, key=lambda p: p.name)
        # concat_ws skips NULLs in both Spark and DuckDB, so the CASE chain
        # in name order is the portable reason-string recipe.
        viol = F.concat_ws(
            ",", *[F.when(p.violated, F.lit(p.name)) for p in checks]
        )
        tagged = self._df.withColumn("violations", viol)
        good = tagged.filter(F.col("violations") == "").drop("violations")
        bad = tagged.filter(F.col("violations") != "")
        return good, bad

    # -- report ----------------------------------------------------------

    def predicate_counts(self) -> DataFrame:
        """The fused one-scan aggregation behind the predicate checks: one
        wide row — ``__n`` (rows checked) plus one violation-count column
        per check. A plain sum/count aggregation, so it ALSO works on a
        streaming DataFrame (complete mode): micro-batch partials merge to
        exactly the batch answer, which is how quality monitoring rides an
        incremental pipeline for free."""
        return self._df.agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.coalesce(
                    F.sum(F.when(p.violated, 1).otherwise(0)), F.lit(0)
                ).alias(p.name)
                for p in self._predicates
            ],
        )

    def report_from_counts(self, wide: DataFrame) -> DataFrame:
        """Unpivot a ``predicate_counts()`` row (possibly round-tripped
        through a streaming sink) into standard report rows."""
        return (
            wide.unpivot(
                ids=["__n"],
                values=[p.name for p in self._predicates],
                variableColumnName="check_name",
                valueColumnName="n_violations",
            )
            .select(
                F.lit(self._table).alias("table_name"),
                "check_name",
                F.col("__n").alias("n_checked"),
                "n_violations",
            )
            .withColumn("passed", F.col("n_violations") == 0)
            .select(*REPORT_COLS)
        )

    def run(self) -> DataFrame:
        """One report row per expectation (see REPORT_COLS)."""
        reports = list(self._extra_reports)
        if self._predicates:
            long = self.report_from_counts(self.predicate_counts()).drop(
                "passed"
            )
            reports.append(long)
        if not reports:
            raise ValueError(
                f"suite {self._table!r} has no checks — add at least one "
                "expect_* before run()"
            )
        out = reports[0]
        for r in reports[1:]:
            out = out.unionByName(r)
        return out.withColumn("passed", F.col("n_violations") == 0).select(
            *REPORT_COLS
        )


def union_reports(*reports: DataFrame) -> DataFrame:
    if not reports:
        raise ValueError("union_reports() needs at least one report")
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
