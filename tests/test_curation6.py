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


def test_hybrid_rrf_invariants(spark):
    """RRF semantics against the legs it fuses: a doc in BOTH legs' top-5
    must score the sum of the two reciprocal terms; a doc in one leg
    scores exactly that leg's term; rank-1 agreement between a leg and
    the fusion holds whenever the leg's top doc also tops the other leg
    (not asserted — just the score identity, which pins the fusion
    arithmetic end to end)."""
    from datalakes_and_data_integration_spark.plans.curation6 import (
        _RRF_K,
        _RRF_SCALE,
        _digests_spark,
        _leg_idf_spark,
        _leg_overlap_spark,
        _split_docs_spark,
        hybrid_retrieval_rrf,
    )
    from pyspark.sql import functions as F

    split_docs = _split_docs_spark(spark, SF)
    n_train = split_docs.filter(F.col("split") == "train").count()
    leg_a = {
        (r.query_doc_id, r.doc_id): r.rank
        for r in _leg_idf_spark(_digests_spark(split_docs, 3), n_train).collect()
    }
    leg_b = {
        (r.query_doc_id, r.doc_id): r.rank
        for r in _leg_overlap_spark(_digests_spark(split_docs, 8)).collect()
    }
    fused = hybrid_retrieval_rrf(spark, SF).collect()
    assert fused
    both = 0
    for r in fused:
        key = (r.query_doc_id, r.doc_id)
        expect = 0
        if key in leg_a:
            expect += _RRF_SCALE // (_RRF_K + leg_a[key])
        if key in leg_b:
            expect += _RRF_SCALE // (_RRF_K + leg_b[key])
        assert expect > 0, f"fused row {key} is in neither leg's top-k"
        assert r.rrf_score == expect
        if key in leg_a and key in leg_b:
            both += 1
    # The two signals must actually overlap somewhere, or the fusion is
    # a trivial union.
    assert both > 0


def test_scd2_dimension_build_invariants(spark):
    from datalakes_and_data_integration_spark.plans.temporal import (
        scd2_dimension_build,
    )

    rows = scd2_dimension_build(spark, SF).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for u, vs in by_user.items():
        vs.sort(key=lambda r: r.version)
        assert [r.version for r in vs] == list(range(1, len(vs) + 1))
        # Exactly one open (current) version per user — the last one.
        currents = [r for r in vs if r.is_current]
        assert len(currents) == 1 and currents[0].version == len(vs)
        for prev, nxt in zip(vs, vs[1:]):
            # Contiguous validity: each version closes where the next
            # opens, and consecutive versions carry DIFFERENT attrs
            # (change detection compresses runs).
            assert prev.valid_to == nxt.valid_from
            assert prev.attr != nxt.attr


def test_embedding_corpus_manifest_composes_the_tiers(spark):
    """The manifest's verdict columns must equal the registered tier
    queries' verdicts row for row, and `kept` must be their exact
    conjunction with the train split."""
    from datalakes_and_data_integration_spark.functions.hashing import (
        hash60_py,
    )
    from datalakes_and_data_integration_spark.plans.curation6 import (
        embedding_corpus_manifest,
        prototypicality_pruning,
        semantic_dedup_assignment,
    )

    man = {r.vec_id: r for r in embedding_corpus_manifest(spark, SF).collect()}
    sem = {r.vec_id: r for r in semantic_dedup_assignment(spark, SF).collect()}
    pro = {r.vec_id: r for r in prototypicality_pruning(spark, SF).collect()}
    assert set(man) == set(sem) == set(pro)
    kept = 0
    for vid, r in man.items():
        assert r.is_removed == sem[vid].is_removed
        assert r.is_pruned == pro[vid].is_pruned
        assert r.cluster == sem[vid].cluster == pro[vid].cluster
        is_train = hash60_py(str(vid), seed=7) % 100 < 80
        assert (r.split == "train") == is_train
        assert r.kept == (is_train and not r.is_removed and not r.is_pruned)
        kept += r.kept
    assert 0 < kept < len(man)


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
