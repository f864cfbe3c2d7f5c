"""Embedding-space curation (plans/curation6.py): invariants the DuckDB
hash-equality gate cannot express, plus the plan-shape pin for the
cluster-bounded pair join."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

SF = "/root/testdata/sf0.001"


def test_semantic_dedup_invariants(spark):
    from datalakes_and_data_integration_spark.plans.curation6 import (
        semantic_dedup_assignment,
    )

    rows = semantic_dedup_assignment(spark, SF).collect()
    n = len(rows)
    removed = [r for r in rows if r.is_removed]
    # Non-vacuous both ways: the threshold removes something, never
    # everything.
    assert 0 < len(removed) < n
    # Keep-one-representative: the LEAST prototypical member of a
    # cluster (max dist, ties to max vec_id) can never be removed —
    # every remover must be strictly less prototypical — so every
    # cluster keeps at least one member.
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)
    for cl, members in by_cluster.items():
        kept = [r for r in members if not r.is_removed]
        assert kept, f"cluster {cl} removed ALL members"
        anchor = max(members, key=lambda r: (r.dist, r.vec_id))
        assert not anchor.is_removed, (
            f"cluster {cl}: the least prototypical member was removed"
        )


def test_prototypicality_pruning_invariants(spark):
    from datalakes_and_data_integration_spark.plans.curation6 import (
        prototypicality_pruning,
    )

    rows = prototypicality_pruning(spark, SF).collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)
    total_pruned = 0
    for cl, members in by_cluster.items():
        n = len(members)
        assert all(r.n_cluster == n for r in members)
        pruned = [r for r in members if r.is_pruned]
        # Exactly the most-prototypical quarter, floor semantics.
        assert len(pruned) == n // 4, (cl, n, len(pruned))
        # The pruned set is a rank prefix: every pruned rank below every
        # kept rank.
        if pruned:
            assert max(r.proto_rank for r in pruned) == n // 4
        total_pruned += len(pruned)
    assert total_pruned > 0


def test_semantic_dedup_pair_join_is_cluster_bounded(spark):
    """The duplicate-pair join must be an equi join on the cluster id —
    never a nested-loop/cartesian shape whose cosine condition would
    evaluate interpreted per pair (the round-6 ML-ladder lesson:
    embedding_near_dup's bare BNLJ ran 857 s at 20k vs 47.8 s for the
    same pairs through a bounded join)."""
    from datalakes_and_data_integration_spark.plans.curation6 import (
        semantic_dedup_assignment,
    )

    buf = io.StringIO()
    with redirect_stdout(buf):
        semantic_dedup_assignment(spark, SF).explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lexical_retrieval_invariants(spark):
    from datalakes_and_data_integration_spark.functions.hashing import (
        hash60_py,
    )
    from datalakes_and_data_integration_spark.plans.curation6 import (
        lexical_topk_retrieval,
    )

    rows = lexical_topk_retrieval(spark, SF).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_doc_id, []).append(r)
        # Queries are eval-split docs, retrieved docs are train-split.
        assert hash60_py(str(r.query_doc_id), seed=7) % 100 >= 80
        assert hash60_py(str(r.doc_id), seed=7) % 100 < 80
        assert r.score > 0
    for q, hits in by_q.items():
        # <= k hits, ranks are the contiguous prefix, scores descend
        # along ranks (ties broken by doc_id — monotone non-increasing).
        assert len(hits) <= 5
        hits.sort(key=lambda r: r.rank)
        assert [r.rank for r in hits] == list(range(1, len(hits) + 1))
        scores = [r.score for r in hits]
        assert scores == sorted(scores, reverse=True)


def test_lexical_retrieval_plan_shapes(spark):
    """The inverted-index join must stay a hash equi join (no pair
    term), and the per-query top-k must run the partial-top-k
    optimization instead of materializing every candidate."""
    from datalakes_and_data_integration_spark.plans.curation6 import (
        lexical_topk_retrieval,
    )

    buf = io.StringIO()
    with redirect_stdout(buf):
        lexical_topk_retrieval(spark, SF).explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "WindowGroupLimit" in plan
