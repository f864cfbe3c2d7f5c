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
