"""Events/temporal-family decade probe (round-6 second session).

Third member of the ladder-probe family (ANN: ann_ladder_probe.py;
documents: dedup_ladder_probe.py): the temporal / sessionization /
window-function surface over ``events``, measured at two decades:

- sf0.1 as-is: 100,000 events
- a 10x tiled copy: 1,000,000 events

Tiling models how a 10x deployment actually grows — MORE USERS in the
SAME time range: copy c>0 offsets user_id and event_id by c*stride and
keeps ts/event_type/value/props verbatim. Per-user window shapes
(sessions, sequences, retention transitions) are preserved exactly;
per-timestamp group cardinality grows 10x; the time grid (gap-fill
output, hourly buckets) stays fixed.

Only pure-events queries are laddered — queries that join events to the
customer dimension (dau_by_nation, salted_join_user_profile,
skew_salted_join_stats) are excluded because tiled user_ids have no
dimension rows, which would silently change join semantics rather than
scale them.

Usage: python tools/events_ladder_probe.py [--skip-1m] [--only a,b]
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

# Ordered cheap->heavy; every entry reads ONLY the events table.
LADDER = [
    "tumbling_hourly_agg",
    "rolling_1h_value_sum",
    "sessionization",
    "session_window_native",
    "event_transition_matrix",
    "event_sequence_pattern",
    "asof_join_last_click",
    "conversion_latency_quantiles",
    "range_join_views_before_purchase",
    "dau_new_returning_resurrected",
    "session_bounce_rate_daily",
    "gapfill_hourly_interpolate",
    "json_props_extract",
    "scd2_dimension_build",
    "streaming_scd2_upsert",
    "attribution_multi_touch",
    "dim_snapshot_diff",
    "user_lifespan_survival",
    "dim_asof_enrichment",
    "cusum_changepoint",
    "robust_scaling_mad",
    "bitmap_distinct_rollup",
    "snapshot_retention_plan",
    "km_hazard_table",
    "watermark_lateness_profile",
    "cdc_merge_apply",
    # round-7 sixth session
    "rolling_exact_distinct_users_7d",
    # round 8
    "change_data_feed_build",
    "ab_assignment_srm_audit",
    "ab_metric_cuped_adjustment",
    "streaming_ab_moments_maintenance",
    "ab_proportion_ztest",
    "ab_mann_whitney_u",
    "compaction_bin_packing_plan",
    "deletion_vector_cost_report",
    "streaming_heavy_hitters_cms",
    "table_diff_merkle",
    "streaming_bitmap_distinct_maintenance",
    "dp_noisy_release_audit",
    "histogram_quantile_audit",
    "lakehouse_maintenance_planner",
    # round 9, second session: sequential/resampling experiment readouts
    "ab_bootstrap_diff_ci",
    "ab_sequential_msprt",
    "ab_power_mde_report",
    "ab_segment_heterogeneity",
    "ab_ratio_metric_delta_method",
    "streaming_ab_msprt_maintenance",
    "interval_overlap_join_sessions",
    "ab_segment_fdr_bh",
    # round 9, third session
    "ab_anova_oneway",
    "streaming_quantile_maintenance",
    "mann_kendall_theil_sen",
    "ab_logrank_test",
    "daily_cross_correlation",
    "streaming_ccf_maintenance",
]


def build_tiled_events(src_dir: str, out_dir: str, tile: int) -> int:
    """Write a tile-x events.parquet (new users, same time range);
    symlink every other table."""
    t = pq.read_table(os.path.join(src_dir, "events.parquet"))
    eids = t.column("event_id").to_numpy()
    uids = t.column("user_id").to_numpy()
    e_stride = int(eids.max()) + 1
    u_stride = int(uids.max()) + 1
    parts = []
    for c in range(tile):
        parts.append(
            pa.table(
                {
                    "event_id": pa.array(eids + c * e_stride, pa.int64()),
                    "ts": t.column("ts"),
                    "user_id": pa.array(uids + c * u_stride, pa.int64()),
                    "event_type": t.column("event_type"),
                    "value": t.column("value"),
                    "props": t.column("props"),
                }
            )
        )
    pq.write_table(
        pa.concat_tables(parts), os.path.join(out_dir, "events.parquet")
    )
    for name in TABLES:
        if name == "events":
            continue
        src = os.path.join(src_dir, f"{name}.parquet")
        if os.path.exists(src):
            os.symlink(src, os.path.join(out_dir, f"{name}.parquet"))
    return t.num_rows * tile


def main() -> None:
    probe_main(
        metric="events_ladder_probe",
        ladder=LADDER,
        base_label="100k",
        tiled_label="1m",
        sf_dir=SF_DIR,
        build_tiled=build_tiled_events,
        tempdir_prefix="events_probe_1m_",
        default_runs=2,
        corpus_noun="events",
    )


if __name__ == "__main__":
    main()
