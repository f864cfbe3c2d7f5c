"""Streaming HLL maintenance: incrementally merged register files equal
the batch-built registers over the union of the data — the property that
makes the sketch the 100 TB answer to continuous distinct counting."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def _events(spark, sf="/root/testdata/sf0.001"):
    from datalakes_and_data_integration_spark.plans._util import T

    return T(spark, sf, "events").select("event_type", "user_id", "event_id")


def test_incremental_merge_equals_batch(spark):
    from datalakes_and_data_integration_spark.streaming.sketch_maintenance import (
        hll_registers,
        merge_hll_state,
    )

    ev = _events(spark)
    b1 = ev.filter(F.col("event_id") % 2 == 0)
    b2 = ev.filter(F.col("event_id") % 2 == 1)

    state = tempfile.mkdtemp(prefix="hllstate_") + "/regs"
    merge_hll_state(spark, state, hll_registers(b1, "event_type", "user_id"))
    merged = merge_hll_state(
        spark, state, hll_registers(b2, "event_type", "user_id")
    )

    batch = hll_registers(ev, "event_type", "user_id")
    m = {(r.grp, r.reg): r.mrho for r in merged.collect()}
    b = {(r.grp, r.reg): r.mrho for r in batch.collect()}
    assert m == b


def test_redelivery_is_noop(spark):
    from datalakes_and_data_integration_spark.streaming.sketch_maintenance import (
        hll_registers,
        merge_hll_state,
    )

    ev = _events(spark)
    state = tempfile.mkdtemp(prefix="hllstate_") + "/regs"
    regs = hll_registers(ev, "event_type", "user_id")
    first = {
        (r.grp, r.reg): r.mrho
        for r in merge_hll_state(spark, state, regs).collect()
    }
    again = {
        (r.grp, r.reg): r.mrho
        for r in merge_hll_state(spark, state, regs).collect()
    }
    assert first == again


def test_estimate_matches_query_path(spark):
    """The maintained-state estimate equals distinct_count_hll's estimate
    for the same data (same hash family, same correction)."""
    from datalakes_and_data_integration_spark.plans import all_queries
    from datalakes_and_data_integration_spark.streaming.sketch_maintenance import (
        hll_estimate,
        hll_registers,
    )

    sf = "/root/testdata/sf0.001"
    ev = _events(spark, sf)
    est = {
        r.grp: r.hll_est
        for r in hll_estimate(
            hll_registers(ev, "event_type", "user_id")
        ).collect()
    }
    ref = {
        r.event_type: r.hll_est
        for r in all_queries()["distinct_count_hll"](spark, sf).collect()
    }
    assert est == ref
