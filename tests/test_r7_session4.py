"""Round-7 fourth-session newcomers: invariants the oracle hash gate
cannot express (skyline dominance soundness/completeness, and the
equivalence arguments for the session's other operators)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _dominates(a, b) -> bool:
    """Weak Pareto dominance on (price min, size max) within a brand."""
    return (
        a.p_brand == b.p_brand
        and a.p_retailprice <= b.p_retailprice
        and a.p_size >= b.p_size
        and (a.p_retailprice < b.p_retailprice or a.p_size > b.p_size)
    )


def test_skyline_is_sound_and_complete(spark):
    """Soundness: no frontier row dominates another (antichain).
    Completeness: every non-frontier part is dominated by some frontier
    part of its brand (the frontier is a dominating set)."""
    from datalakes_and_data_integration_spark.plans._util import T
    from datalakes_and_data_integration_spark.plans.relational import (
        skyline_pareto_frontier,
    )

    frontier = skyline_pareto_frontier(spark, SF).collect()
    assert frontier
    by_key = {r.p_partkey for r in frontier}
    # antichain within each brand
    for a in frontier:
        for b in frontier:
            if a.p_partkey != b.p_partkey:
                assert not _dominates(a, b), (a, b)
    # dominating set: every excluded part has a frontier dominator
    parts = (
        T(spark, SF, "part")
        .select("p_partkey", "p_brand", "p_retailprice", "p_size")
        .collect()
    )
    fr_by_brand: dict[str, list] = {}
    for r in frontier:
        fr_by_brand.setdefault(r.p_brand, []).append(r)
    for p in parts:
        if p.p_partkey in by_key:
            continue
        assert any(
            _dominates(f, p) for f in fr_by_brand.get(p.p_brand, [])
        ), p
