"""Unit tests for the declarative data-quality layer (operators/quality.py).

The oracle gate proves the registered report query matches DuckDB on the
lake tables; these tests pin the operator's contract on crafted rows where
every expected count is known by construction, plus the fusion guarantee
(all predicate checks = one aggregation over one scan).
"""

from __future__ import annotations

import pytest

from datalakes_and_data_integration_spark.operators.quality import (
    ExpectationSuite,
    union_reports,
)


@pytest.fixture(scope="module")
def fact(spark):
    return spark.createDataFrame(
        [
            # (id, val, cat, fk)
            (1, 10.0, "a", 100),
            (1, 20.0, "a", 100),  # duplicate id
            (2, -5.0, "b", 200),  # val out of range
            (3, None, "zz", 999),  # null val, bad cat, orphan fk
            (4, 50.0, "b", None),  # null fk: not an orphan
        ],
        "id int, val double, cat string, fk int",
    )


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame([(100,), (200,)], "k int")


def report_map(df):
    return {r.check_name: r for r in df.collect()}


def test_predicate_checks_counts(spark, fact):
    rep = report_map(
        ExpectationSuite(fact, "fact")
        .expect_not_null("val")
        .expect_between("val", 0, 100)
        .expect_in("cat", ("a", "b"))
        .expect_predicate("id_positive", fact.id > 0)
        .run()
    )
    assert rep["val_not_null"].n_violations == 1
    # Range check: nulls don't violate; -5 does.
    assert rep["val_between_0_100"].n_violations == 1
    assert rep["cat_accepted_values"].n_violations == 1
    assert rep["id_positive"].n_violations == 0
    for r in rep.values():
        assert r.n_checked == 5
        assert r.passed == (r.n_violations == 0)


def test_unique_and_fk_counts(spark, fact, dim):
    rep = report_map(
        ExpectationSuite(fact, "fact")
        .expect_unique("id")
        .expect_foreign_key("fk", dim, "k", "dim")
        .run()
    )
    u = rep["id_unique"]
    assert (u.n_checked, u.n_violations, u.passed) == (5, 1, False)
    # 4 non-null fks checked; only the 999 row is an orphan (null fk skipped).
    f = rep["fk_fk_dim_k"]
    assert (f.n_checked, f.n_violations, f.passed) == (4, 1, False)


def test_predicates_fuse_into_one_scan(spark, fact):
    """N predicate checks must compile to ONE aggregate over one scan —
    the whole point of the fused design at 100 TB."""
    suite = (
        ExpectationSuite(fact, "fact")
        .expect_not_null("val")
        .expect_between("val", 0, 100)
        .expect_in("cat", ("a", "b"))
        .expect_predicate("id_positive", fact.id > 0)
    )
    plan = suite.run()._jdf.queryExecution().executedPlan().toString()
    # One HashAggregate pair (partial+final) over a single scan; no join,
    # no union of per-check subplans.
    assert plan.count("Scan ") == 1


def test_union_reports_shape(spark, fact, dim):
    a = ExpectationSuite(fact, "fact").expect_not_null("val").run()
    b = ExpectationSuite(dim, "dim").expect_unique("k").run()
    out = union_reports(a, b)
    assert out.columns == [
        "table_name",
        "check_name",
        "n_checked",
        "n_violations",
        "passed",
    ]
    assert {r.table_name for r in out.collect()} == {"fact", "dim"}


def test_registered_report_query(spark):
    from datalakes_and_data_integration_spark.plans import all_queries

    rows = all_queries()["data_quality_report"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    rep = {(r.table_name, r.check_name): r for r in rows}
    assert len(rep) == 13
    # TPC-H invariants hold on the generated data...
    assert rep[("lineitem", "l_quantity_between_1_50")].passed
    assert rep[("lineitem", "l_orderkey_fk_orders_o_orderkey")].passed
    # ...and the intentionally-tight SLA reports real violations.
    sla = rep[("lineitem", "l_quantity_le_30_sla")]
    assert not sla.passed and 0 < sla.n_violations < sla.n_checked


def test_quarantine_split(spark, fact):
    from pyspark.sql import functions as F

    good, bad = (
        ExpectationSuite(fact, "fact")
        .expect_not_null("val")
        .expect_between("val", 0, 100)
        .expect_in("cat", ("a", "b"))
        .quarantine()
    )
    g = good.collect()
    b = {r.id: r.violations for r in bad.collect()}
    # Rows 1,1,4 pass; row 2 fails the range; row 3 fails null + category.
    assert len(g) == 3 and all(not hasattr(r, "violations") for r in g)
    assert b[2] == "val_between_0_100"
    assert b[3] == "cat_accepted_values,val_not_null"  # alphabetical order
    assert set(b) == {2, 3}


def test_report_agrees_with_quarantine(spark, fact):
    """The fused report and the row-level split must tell the same story:
    per predicate check, n_violations == number of quarantined rows
    naming that check."""
    suite = (
        ExpectationSuite(fact, "fact")
        .expect_not_null("val")
        .expect_between("val", 0, 100)
        .expect_in("cat", ("a", "b"))
        .expect_predicate("id_positive", fact.id > 0)
    )
    rep = report_map(suite.run())
    _, bad = suite.quarantine()
    from collections import Counter

    named = Counter(
        name for r in bad.collect() for name in r.violations.split(",")
    )
    for check, row in rep.items():
        assert row.n_violations == named.get(check, 0), check


def test_empty_suite_and_empty_union_raise(spark, fact):
    import pytest

    from datalakes_and_data_integration_spark.operators.quality import (
        union_reports,
    )

    with pytest.raises(ValueError, match="no checks"):
        ExpectationSuite(fact, "fact").run()
    with pytest.raises(ValueError, match="at least one report"):
        union_reports()


def test_duplicate_check_name_rejected(spark, fact):
    import pytest

    suite = ExpectationSuite(fact, "fact").expect_not_null("val")
    with pytest.raises(ValueError, match="duplicate check name"):
        suite.expect_not_null("val")
