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


def test_zorder_bounds_both_dims_and_balances_files(spark):
    """The point of z-order: every file's envelope is narrow in BOTH
    dims, while the linear sort bounds partkey and spans suppkey. Also:
    equal-row packing (sizes differ by at most 1)."""
    from datalakes_and_data_integration_spark.plans.maintenance import (
        zorder_layout_plan,
    )

    rows = zorder_layout_plan(spark, SF).collect()
    by_layout: dict[str, list] = {}
    for r in rows:
        by_layout.setdefault(r.layout, []).append(r)
    assert set(by_layout) == {"zorder", "linear"}
    for layout, files in by_layout.items():
        sizes = [r.n_rows for r in files]
        assert max(sizes) - min(sizes) <= 1, (layout, sizes)
    spans = {
        layout: sum(r.max_suppkey - r.min_suppkey for r in files)
        for layout, files in by_layout.items()
    }
    # Linear (partkey-sorted) files each span ~the full suppkey domain;
    # z-order cuts the summed suppkey span by a large factor.
    assert spans["zorder"] * 2 < spans["linear"], spans
    # ...without giving up ALL partkey locality: z-order's summed
    # partkey span stays well under the worst case (32 full-domain files).
    dom = max(r.max_partkey for r in by_layout["zorder"]) - min(
        r.min_partkey for r in by_layout["zorder"]
    )
    z_x = sum(r.max_partkey - r.min_partkey for r in by_layout["zorder"])
    assert z_x < 32 * dom / 2, (z_x, dom)
