"""Relational/TPC-H-family decade probe (round-6 third session).

Fourth member of the ladder-probe family (ANN: ann_ladder_probe.py;
documents: dedup_ladder_probe.py; events: events_ladder_probe.py): the
join / aggregate / window surface over the TPC-H-ish tables, measured
at two decades:

- sf0.1 as-is: 600k lineitem / 150k orders / 15k customer
- a 10x tiled copy: 6m lineitem / 1.5m orders / 150k customer

Tiling models how a 10x deployment actually grows — MORE CUSTOMERS
buying from the SAME catalog: copy c>0 offsets c_custkey / o_orderkey /
o_custkey / l_orderkey by c*stride and keeps every other column (dates,
prices, l_partkey / l_suppkey, names) verbatim. All FK joins stay
intact; fact-side cardinality grows 10x; part / supplier / nation /
region dims are fixed, so every broadcast that is correct at sf0.1 must
stay a broadcast at 10x — a dim that starts shuffling is exactly the
regression this probe exists to catch.

The scaling diagnosis: a healthy plan lands near-linear (~1-4x wall at
10x input given fixed session overhead); a broadcast falling back to
sort-merge, a partition collapse, or a per-row-rescan window frame
shows up as a 10x+ ratio or an absolute blowup.

Usage: python tools/relational_ladder_probe.py [--skip-6m] [--only a,b]
Prints a markdown table (BASELINE.md format) plus one JSON line.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import pyarrow as pa
import pyarrow.parquet as pq

from _ladder_common import TABLES, probe_main

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Ordered cheap->heavy: scan-aggregates, windows/ranks, semi/anti and
# star joins, then the multi-join TPC-H heavyweights and profiling
# compositions. Every entry reads only region/nation/customer/supplier/
# part/orders/lineitem (the tiled trio + fixed dims).
LADDER = [
    "tpch_q6_forecast_revenue",
    "tpch_q1_pricing_summary",
    "lineitem_unpivot_measures",
    "orders_rollup",
    "benford_first_digit",
    "revenue_pareto",
    "topn_orders_per_customer",
    "customer_spend_quartiles",
    "semi_join_big_spenders",
    "anti_join_inactive_customers",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q13_customer_distribution",
    "tpch_q18_large_orders",
    "tpch_q9_product_profit",
    "tpch_q8_market_share",
    "shipping_delay_profile",
    "market_basket_brand_pairs",
    "table_profile_lineitem",
    "referential_integrity_check",
    "gdpr_delete_manifest",
    "order_backlog_curve",
    "join_cardinality_estimate_audit",
    "zorder_layout_plan",
    "t_closeness_audit",
    # round-7 sixth session
    "data_skipping_effectiveness",
    "cbo_stats_selectivity_audit",
    "incremental_join_view_maintenance",
    "cube_distinct_hll",
    # round 8
    "entity_resolution_blocked",
    "k_anon_generalization_plan",
    # round 9, second session
    "item_item_cosine_topk",
    # round 9, third session
    "ols_two_factor_regression",
    "er_quality_threshold_sweep",
    "encoding_efficiency_audit",
]

# (table, key columns to offset by that table's stride-owner)
_OFFSETS = {
    "customer": {"c_custkey": "cust"},
    "orders": {"o_orderkey": "okey", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "okey"},
}


def build_tiled_relational(src_dir: str, out_dir: str, tile: int) -> dict:
    """Write tile-x customer/orders/lineitem with offset keys (FKs
    preserved); symlink every other table (fixed catalog dims)."""
    src = {
        t: pq.read_table(os.path.join(src_dir, f"{t}.parquet"))
        for t in _OFFSETS
    }
    strides = {
        "cust": int(src["customer"].column("c_custkey").to_numpy().max()) + 1,
        "okey": int(src["orders"].column("o_orderkey").to_numpy().max()) + 1,
    }
    counts = {}
    for t, table in src.items():
        cols = {f.name: table.column(f.name) for f in table.schema}
        keyed = {
            k: table.column(k).to_numpy() for k in _OFFSETS[t]
        }
        parts = []
        for c in range(tile):
            data = dict(cols)
            for k, owner in _OFFSETS[t].items():
                data[k] = pa.array(
                    keyed[k] + c * strides[owner], pa.int64()
                )
            parts.append(pa.table(data))
        pq.write_table(
            pa.concat_tables(parts), os.path.join(out_dir, f"{t}.parquet")
        )
        counts[t] = table.num_rows * tile
    for name in TABLES:
        if name in _OFFSETS:
            continue
        s = os.path.join(src_dir, f"{name}.parquet")
        if os.path.exists(s):
            os.symlink(s, os.path.join(out_dir, f"{name}.parquet"))
    return counts


def main() -> None:
    probe_main(
        metric="relational_ladder_probe",
        ladder=LADDER,
        base_label="600k",
        tiled_label="6m",
        sf_dir=SF_DIR,
        build_tiled=build_tiled_relational,
        tempdir_prefix="rel_probe_10x_",
        default_runs=3,
        corpus_noun="rows (lineitem x10, orders x10, customer x10)",
    )


if __name__ == "__main__":
    main()
