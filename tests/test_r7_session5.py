"""Round-7 fifth-session newcomers: invariants the oracle hash gate
cannot express."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_watermark_profile_two_pass_equals_naive_and_is_monotone(spark):
    """The bucketed two-pass prefix max must equal the naive global
    window IN SPARK (the driver's hash match proves it vs DuckDB; this
    pins it engine-internally so a bucket-boundary bug can't hide behind
    an oracle edit), and the drop table must be monotone non-increasing
    in the watermark delay with the 600 s bound recovering everything
    (the injected delay is < 600 s, so lateness is provably < 600 s).
    """
    from pyspark.sql import Window

    from datalakes_and_data_integration_spark.functions.hashing import (
        hash60_seeded,
    )
    from datalakes_and_data_integration_spark.plans._util import T
    from datalakes_and_data_integration_spark.plans.timeseries import (
        _WM_DELAY_MOD,
        _WM_SEED,
        watermark_lateness_profile,
    )

    rows = {
        r.wm_delay_s: r
        for r in watermark_lateness_profile(spark, SF).collect()
    }
    delays = sorted(rows)
    # monotone non-increasing drops; zero at the injected-delay bound
    for lo, hi in zip(delays, delays[1:]):
        assert rows[hi].n_dropped <= rows[lo].n_dropped
    assert rows[600].n_dropped == 0
    assert rows[0].n_dropped > 0  # non-vacuous: disorder exists
    assert rows[0].max_lateness_s < _WM_DELAY_MOD

    # naive single-window lateness histogram == the two-pass one
    e = T(spark, SF, "events").select(
        "event_id",
        F.unix_micros("ts").alias("t"),
        (
            F.unix_micros("ts")
            + (
                hash60_seeded(F.col("event_id").cast("string"), _WM_SEED)
                % _WM_DELAY_MOD
            )
            * 1_000_000
        ).alias("a"),
    )
    w = Window.orderBy("a", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )  # scale-ok: test-only naive reference on the sf0.001 fixture
    naive = e.select(
        F.greatest(
            F.coalesce(F.max("t").over(w), F.col("t")), F.col("t")
        ).alias("seen"),
        "t",
    ).select((F.col("seen") - F.col("t")).alias("late_us"))
    n_naive = {
        d: naive.filter(F.col("late_us") > d * 1_000_000).count()
        for d in delays
    }
    for d in delays:
        assert n_naive[d] == rows[d].n_dropped
