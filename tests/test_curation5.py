"""Round-6 capstone queries (plans/curation5.py): invariants that the
DuckDB hash-equality gate cannot express."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_retrieval_quality_report_invariants(spark):
    from datalakes_and_data_integration_spark.plans.curation5 import (
        ann_retrieval_quality_report,
    )

    rows = {r.strategy: r for r in ann_retrieval_quality_report(spark, SF).collect()}
    assert set(rows) == {"lsh_bucketed", "lsh_multiprobe"}
    for r in rows.values():
        assert r.n_queries > 0
        assert r.possible == 5 * r.n_queries  # exact top-5 is complete
        assert 0 <= r.hits <= r.possible
        assert 0.0 <= r.recall_at_5 <= 1.0
    # Multiprobe candidates are a strict superset of the single-bucket
    # path's (pinned elsewhere) -> its hit count can never be lower on
    # the same query set.
    assert rows["lsh_multiprobe"].hits >= rows["lsh_bucketed"].hits
    # Both legs audit the same representative query set.
    assert rows["lsh_multiprobe"].n_queries == rows["lsh_bucketed"].n_queries


def test_retrieval_queries_are_neardup_representatives(spark):
    """Every audited query is a local-min representative: it appears in
    a near-dup pair and never as the larger id of one."""
    from datalakes_and_data_integration_spark.plans.curation5 import (
        ann_retrieval_quality_report,
    )
    from datalakes_and_data_integration_spark.plans.similarity import (
        embedding_near_dup,
    )

    nd = embedding_near_dup(spark, SF).collect()
    a_side = {r.vec_a for r in nd}
    b_side = {r.vec_b for r in nd}
    reps = a_side - b_side
    n_queries = ann_retrieval_quality_report(spark, SF).collect()[0].n_queries
    assert n_queries == len(reps)
    assert reps  # the sf0.001 corpus does produce near-dup pairs


def test_tier_overlap_report_invariants(spark):
    from datalakes_and_data_integration_spark.plans.curation5 import (
        dedup_tier_overlap_report,
    )
    from datalakes_and_data_integration_spark.plans.curation3 import (
        dedup_savings_report,
    )

    rows = dedup_tier_overlap_report(spark, SF).collect()
    assert len(rows) == 10  # all 5-choose-2 tier pairs, even empty ones
    assert {(r.tier_a, r.tier_b) for r in rows} == {
        ("cluster", "containment"),
        ("cluster", "exact"),
        ("cluster", "passage"),
        ("cluster", "span"),
        ("containment", "exact"),
        ("containment", "passage"),
        ("containment", "span"),
        ("exact", "passage"),
        ("exact", "span"),
        ("passage", "span"),
    }
    for r in rows:
        assert r.n_both <= min(r.n_a, r.n_b)
        assert 0.0 <= r.jaccard <= 1.0
        if r.n_a + r.n_b == 0:
            assert r.jaccard == 0.0

    # Per-tier totals agree with dedup_savings_report's accounting for
    # the tiers both reports flag (exact and neardup-cluster losers).
    savings = {r.tier: r.n_docs_affected for r in dedup_savings_report(spark, SF).collect()}
    by_tier = {}
    for r in rows:
        by_tier[r.tier_a] = r.n_a
        by_tier[r.tier_b] = r.n_b
    assert by_tier["exact"] == savings["exact"]
    assert by_tier["cluster"] == savings["neardup"]
    assert by_tier["passage"] == savings["passage"]


def test_split_decontamination_invariants(spark):
    from datalakes_and_data_integration_spark.plans.curation5 import (
        split_decontamination_report,
    )
    from datalakes_and_data_integration_spark.plans.text import (
        dataset_split_assignment,
    )

    rows = {r.split: r for r in split_decontamination_report(spark, SF).collect()}
    assert set(rows) == {"val", "test"}
    splits = {r.split: r.n_docs for r in dataset_split_assignment(spark, SF).collect()}
    for split, r in rows.items():
        # Doc accounting matches the registered split exactly.
        assert r.n_docs == splits[split]
        assert 0 <= r.n_contaminated <= r.n_docs
        assert 0.0 <= r.contamination_rate <= 1.0


def test_split_decontamination_flags_planted_leak(spark, tmp_path):
    """Plant an eval doc that quotes 8 consecutive tokens of a train doc
    verbatim: it must be flagged; a disjoint-vocabulary doc must not."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datalakes_and_data_integration_spark.plans.curation5 import (
        split_decontamination_report,
    )
    from datalakes_and_data_integration_spark.functions.hashing import hash60_py

    def bucket(doc_id: int) -> int:
        return hash60_py(str(doc_id), seed=7) % 100

    train_id = next(i for i in range(1, 10_000) if bucket(i) < 80)
    val_ids = [i for i in range(1, 10_000) if 80 <= bucket(i) < 90]
    test_ids = [i for i in range(1, 10_000) if bucket(i) >= 90]
    leak_id, clean_id, test_id = val_ids[0], val_ids[1], test_ids[0]

    span = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = {
        train_id: f"prefix words {span} suffix words",
        leak_id: f"totally different framing yet {span} quoted inside",
        clean_id: "unrelated vocabulary entirely disjoint tokens here now",
        test_id: "another disjoint set of words for the test split",
    }
    table = pa.table(
        {
            "doc_id": pa.array(list(docs), pa.int64()),
            "text": pa.array(list(docs.values())),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["synthetic"] * 4),
            "n_chars": pa.array([len(t) for t in docs.values()], pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))

    rows = {
        r.split: r
        for r in split_decontamination_report(spark, str(tmp_path)).collect()
    }
    assert rows["val"].n_docs == 2
    assert rows["val"].n_contaminated == 1  # the planted quote, not clean
    assert rows["val"].contamination_rate == 0.5
    assert rows["test"].n_contaminated == 0
