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


def test_cms_merge_is_exactly_once_behind_the_ledger(spark, tmp_path):
    """CMS merge is SUM — redelivery would double-count — so the ledger
    must make a replayed batch id a no-op, while a NEW id still merges;
    and the maintained sketch must equal the batch-built one."""
    from pyspark.sql import functions as F

    from datalakes_and_data_integration_spark.plans._util import T
    from datalakes_and_data_integration_spark.streaming.sketch_maintenance import (
        cms_rows,
        merge_cms_state,
    )

    ev = T(spark, "/root/testdata/sf0.001", "events").select("user_id", "ts")
    b1 = ev.filter(F.col("ts") < "2024-01-15")
    b2 = ev.filter(F.col("ts") >= "2024-01-15")
    state = str(tmp_path / "cms_state")

    merge_cms_state(spark, state, cms_rows(b1, "user_id"), batch_id=0)
    merged = merge_cms_state(spark, state, cms_rows(b2, "user_id"), batch_id=1)
    snapshot = {(r.seed, r.bucket): r.total for r in merged.collect()}

    # replayed ids: both are no-ops
    for bid, b in ((0, b1), (1, b2)):
        replay = merge_cms_state(spark, state, cms_rows(b, "user_id"), bid)
        assert {
            (r.seed, r.bucket): r.total for r in replay.collect()
        } == snapshot

    # maintained == batch-built over the union
    full = {
        (r.seed, r.bucket): r.total
        for r in cms_rows(ev, "user_id").collect()
    }
    assert snapshot == full

    # a new id still merges (totals strictly grow somewhere)
    again = merge_cms_state(spark, state, cms_rows(b1, "user_id"), batch_id=2)
    grown = {(r.seed, r.bucket): r.total for r in again.collect()}
    assert sum(grown.values()) > sum(snapshot.values())


def test_bitmap_merge_is_idempotent_without_a_ledger(spark, tmp_path):
    """bit_or is idempotent: replaying ANY batch (no ledger involved)
    must leave the state byte-identical, and the maintained words must
    equal the batch-built words over the union."""
    from pyspark.sql import functions as F

    from datalakes_and_data_integration_spark.plans._util import T
    from datalakes_and_data_integration_spark.streaming.sketch_maintenance import (
        bitmap_words,
        merge_bitmap_state,
    )

    ev = T(spark, "/root/testdata/sf0.001", "events").select(
        "event_type", "user_id", "ts"
    )
    b1 = ev.filter(F.col("ts") < "2024-01-15")
    b2 = ev.filter(F.col("ts") >= "2024-01-15")
    state = str(tmp_path / "words")

    merge_bitmap_state(spark, state, bitmap_words(b1, "event_type", "user_id"))
    merged = merge_bitmap_state(
        spark, state, bitmap_words(b2, "event_type", "user_id")
    )
    snapshot = {(r.grp, r.w): r.bits for r in merged.collect()}

    for b in (b1, b2, b1):  # replay both, in any order
        replay = merge_bitmap_state(
            spark, state, bitmap_words(b, "event_type", "user_id")
        )
        assert {(r.grp, r.w): r.bits for r in replay.collect()} == snapshot

    full = {
        (r.grp, r.w): r.bits
        for r in bitmap_words(ev, "event_type", "user_id").collect()
    }
    assert snapshot == full
