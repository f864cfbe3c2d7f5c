"""Round-7 third-session newcomers: invariants the oracle hash gate
cannot express (streaming-vs-batch identity for the IVF ingest path,
purity accounting, delete-manifest consistency)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_streaming_ivf_ingest_equals_batch_assignment(spark):
    """The stateless streaming add() path must produce exactly the batch
    primary assignment, independent of batching."""
    from datalakes_and_data_integration_spark.plans import all_queries
    from datalakes_and_data_integration_spark.plans.curation6 import (
        _trained_primary,
    )

    got = sorted(
        map(
            tuple,
            all_queries()["streaming_ivf_ingest"](spark, SF).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            _trained_primary(spark, SF)
            .select("vec_id", "cluster", "dist")
            .collect(),
        )
    )
    assert got == want


def test_cluster_label_purity_accounting(spark):
    from datalakes_and_data_integration_spark.plans.curation6 import (
        cluster_label_purity,
    )
    from datalakes_and_data_integration_spark.plans._util import T

    rows = cluster_label_purity(spark, SF).collect()
    assert rows
    n_vecs = T(spark, SF, "embeddings").count()
    assert sum(r.n for r in rows) == n_vecs  # every vector in one cluster
    for r in rows:
        assert 1 <= r.majority_n <= r.n
        assert r.purity_permille == (1000 * r.majority_n) // r.n
    # Non-vacuous: the quantizer is structure-bearing on the clustered
    # fixture corpus — at least one cluster is not pure noise (purity
    # above the 10-label uniform floor of ~100).
    assert any(r.purity_permille > 150 for r in rows)


def test_gdpr_delete_manifest_consistency(spark):
    from datalakes_and_data_integration_spark.plans.maintenance import (
        gdpr_delete_manifest,
    )

    rows = {r.table_name: r for r in gdpr_delete_manifest(spark, SF).collect()}
    assert set(rows) == {"customer", "orders", "events"}
    for r in rows.values():
        assert r.n_rows >= r.n_keys >= 0
        assert r.n_partitions >= (1 if r.n_rows else 0)
    # customer is keyed by c_custkey: one row per key.
    assert rows["customer"].n_rows == rows["customer"].n_keys
    # The sample is non-vacuous at every SF (2% of >= 150 customers).
    assert rows["customer"].n_rows > 0
    # Facts only reference forgotten customers that exist.
    assert rows["orders"].n_keys <= rows["customer"].n_keys
    assert rows["events"].n_keys <= rows["customer"].n_keys


def test_attribution_credits_sum_to_1000_per_purchase(spark):
    from datalakes_and_data_integration_spark.plans.temporal import (
        attribution_multi_touch,
    )

    rows = attribution_multi_touch(spark, SF).collect()
    assert rows
    by_p: dict[int, list] = {}
    for r in rows:
        by_p.setdefault(r.purchase_id, []).append(r)
    for pid, touches in by_p.items():
        assert sum(t.credit_permille for t in touches) == 1000, pid
        n = touches[0].n_touches
        assert all(t.n_touches == n for t in touches)
        assert sorted(t.touch_rank for t in touches) == list(
            range(1, n + 1)
        )
        # Remainder goes to the most recent touch only.
        base = 1000 // n
        for t in touches:
            expect = base + (1000 % n if t.touch_rank == 1 else 0)
            assert t.credit_permille == expect, (pid, t.touch_rank)


def test_minhash_estimate_audit_ranges_and_bias(spark):
    from datalakes_and_data_integration_spark.plans.curation7 import (
        minhash_estimate_audit,
    )

    rows = minhash_estimate_audit(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.est_permille <= 1000
        assert 0 <= r.exact_permille <= 1000
        assert r.err_permille == r.est_permille - r.exact_permille
        # A band collision means at least one 2-row band agrees, so at
        # least 2 of the 8 signature components match: est >= 250.
        assert r.est_permille >= 250
    # Collision-conditioning biases the estimator HIGH on candidates —
    # the audit's reason to exist. Check the direction on average.
    mean_err = sum(r.err_permille for r in rows) / len(rows)
    assert mean_err > 0


def test_dim_snapshot_diff_invariants(spark):
    from datalakes_and_data_integration_spark.plans.temporal import (
        dim_snapshot_diff,
    )

    rows = dim_snapshot_diff(spark, SF).collect()
    kinds = {r.change_type for r in rows}
    # Appending later events can never delete a version.
    assert "removed" not in kinds
    # The later window both adds versions and closes formerly-open ones.
    assert "added" in kinds and "changed" in kinds and "unchanged" in kinds
    # Added rows always carry the new side's validity columns.
    for r in rows:
        if r.change_type == "added":
            assert r.valid_from is not None
    # (user_id, version) is the diff key: unique.
    keys = [(r.user_id, r.version) for r in rows]
    assert len(keys) == len(set(keys))


def test_lsh_band_tradeoff_nesting_and_monotonicity(spark):
    """The three framings of the same signatures NEST: a 4-row band
    agreement implies both 2-row halves agree, and a 2-row agreement
    implies each component agrees — so candidates (and with them
    recall) are monotone in rows-per-band."""
    from datalakes_and_data_integration_spark.plans.curation7 import (
        lsh_band_tradeoff_report,
    )

    rows = {
        (r.n_bands, r.rows_per_band): r
        for r in lsh_band_tradeoff_report(spark, SF).collect()
    }
    assert set(rows) == {(4, 2), (2, 4), (8, 1)}
    assert (
        rows[(2, 4)].n_candidates
        <= rows[(4, 2)].n_candidates
        <= rows[(8, 1)].n_candidates
    )
    assert (
        rows[(2, 4)].n_caught
        <= rows[(4, 2)].n_caught
        <= rows[(8, 1)].n_caught
    )
    n_true = rows[(4, 2)].n_true_pairs
    for r in rows.values():
        assert r.n_true_pairs == n_true
        assert 0 <= r.n_caught <= min(r.n_candidates, n_true)
        assert r.recall_permille == (1000 * r.n_caught) // max(n_true, 1)
        assert r.precision_permille == (
            1000 * r.n_caught
        ) // r.n_candidates


def test_user_lifespan_survival_monotone(spark):
    from datalakes_and_data_integration_spark.plans.temporal import (
        user_lifespan_survival,
    )

    rows = sorted(
        user_lifespan_survival(spark, SF).collect(),
        key=lambda r: r.day_offset,
    )
    assert [r.day_offset for r in rows] == list(range(30))
    # Day 0: every user's span is >= 0.
    assert rows[0].survival_permille == 1000
    for a, b in zip(rows, rows[1:]):
        assert b.n_surviving <= a.n_surviving


def test_asof_enrichment_matches_event_own_attr(spark):
    """Every purchase event carries props in this corpus, so it is
    itself a change-candidate row of the dimension — the point-in-time
    join must therefore return exactly the attr of the version the
    purchase's own event belongs to: its own parsed attr bucket."""
    from pyspark.sql import functions as F

    from datalakes_and_data_integration_spark.plans.temporal import (
        dim_asof_enrichment,
        scd2_parse,
    )

    got = {
        r.purchase_id: r for r in dim_asof_enrichment(spark, SF).collect()
    }
    own = {
        r.event_id: r.attr
        for r in scd2_parse(spark, SF)
        .join(
            spark.read.parquet(f"{SF}/events.parquet")
            .filter(F.col("event_type") == "purchase")
            .select("event_id"),
            "event_id",
        )
        .collect()
    }
    assert set(got) == set(own)  # one row per purchase, none dropped
    for eid, r in got.items():
        assert r.attr_at_purchase == own[eid], eid
        assert r.version is not None and r.version >= 1


def test_order_backlog_curve_accounting(spark):
    from datalakes_and_data_integration_spark.plans._util import T
    from datalakes_and_data_integration_spark.plans.temporal import (
        order_backlog_curve,
    )

    rows = sorted(
        order_backlog_curve(spark, SF).collect(), key=lambda r: r.day
    )
    n_orders = T(spark, SF, "orders").count()
    # Every order opens exactly once inside the grid.
    assert sum(r.n_opened for r in rows) == n_orders
    # The curve is the running difference and never dips negative.
    run = 0
    for r in rows:
        run += r.n_opened - r.n_closed
        assert r.n_open == run, r.day
        assert r.n_open >= 0
    # The grid is a contiguous daily spine.
    days = [r.day for r in rows]
    assert all((b - a).days == 1 for a, b in zip(days, days[1:]))


def test_join_cardinality_estimate_never_underestimates(spark):
    """CMS inner products upper-bound the true join size (collisions
    only ADD cross terms) — every per-hash estimate must be >= exact,
    and the reported minimum must be the row-wise minimum."""
    from datalakes_and_data_integration_spark.plans.sketches import (
        join_cardinality_estimate_audit,
    )

    rows = join_cardinality_estimate_audit(spark, SF).collect()
    assert len(rows) == 4
    exact = rows[0].exact_join_rows
    assert exact > 0
    assert all(r.exact_join_rows == exact for r in rows)
    est_min = min(r.estimate_i for r in rows)
    for r in rows:
        assert r.estimate_i >= exact, r.hash_i
        assert r.est_min == est_min
        assert r.over_permille == (1000 * (est_min - exact)) // exact
