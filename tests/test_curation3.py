"""Invariants of the round-3 curation operators (plans/curation3.py),
beyond the cross-engine oracle checks:

- Hamilton apportionment: quotas are integers that sum EXACTLY to the
  budget, and each cell gets floor or floor+1 of its exact share (the
  no-drift guarantee the method exists for).
- Passage dedup: globally, exactly one copy of every distinct passage
  survives (sum of kept == distinct passages).
- k-core: the peel reached a fixpoint at the shipped round budget — no
  node retains degree 1 in the final edge set (an unconverged peel
  leaves sub-k degrees behind).
- Exact quantiles: the distributed rank-selection result equals Spark's
  own exact percentile() (same linear-interpolation definition).
"""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_quota_sums_to_budget_and_stays_within_one(spark):
    from datalakes_and_data_integration_spark.plans.curation3 import (
        _N_EVAL,
        quota_sample_apportionment,
    )

    rows = quota_sample_apportionment(spark, SF).collect()
    assert sum(r["quota"] for r in rows) == _N_EVAL
    total = sum(r["n_docs"] for r in rows)
    for r in rows:
        exact = _N_EVAL * r["n_docs"] / total
        assert exact - 1 < r["quota"] < exact + 1, (r, exact)


def test_passage_dedup_keeps_each_passage_exactly_once(spark):
    from datalakes_and_data_integration_spark.plans.curation3 import (
        _PASS,
        _TOK_SPARK,
        passage_dedup_rewrite,
    )
    from datalakes_and_data_integration_spark.plans._util import T

    out = passage_dedup_rewrite(spark, SF)
    kept_total = out.agg(F.sum("n_kept")).collect()[0][0]

    d = T(spark, SF, "documents")
    tok = d.select("doc_id", F.expr(_TOK_SPARK).alias("toks")).filter(
        F.size("toks") > 0
    )
    distinct_passages = (
        tok.select(
            F.explode(
                F.expr(
                    f"sequence(0, CAST(floor((size(toks) - 1) / {_PASS}) "
                    "AS BIGINT))"
                )
            ).alias("pidx"),
            "toks",
        )
        .select(
            F.expr(
                f"concat_ws(' ', slice(toks, pidx * {_PASS} + 1, {_PASS}))"
            ).alias("ptext")
        )
        .distinct()
        .count()
    )
    assert kept_total == distinct_passages
    # And no document keeps more passages than it has.
    assert out.filter(F.col("n_kept") > F.col("n_passages")).count() == 0


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_kcore_peel_reached_fixpoint(spark, sf):
    from datalakes_and_data_integration_spark.plans.curation3 import (
        kcore_dup_graph,
    )

    out = kcore_dup_graph(spark, sf)
    # Fixpoint: the final edge set contains no sub-k degrees. An
    # unconverged peel would leave core_degree == 1 nodes behind.
    assert out.filter(F.col("core_degree") == 1).count() == 0
    # Membership is exactly the degree test.
    assert (
        out.filter(
            (F.col("in_2core") & (F.col("core_degree") < 2))
            | (~F.col("in_2core") & (F.col("core_degree") >= 2))
        ).count()
        == 0
    )


def test_exact_quantiles_match_spark_percentile(spark):
    from datalakes_and_data_integration_spark.plans._util import T
    from datalakes_and_data_integration_spark.plans.curation3 import (
        exact_quantiles_two_pass,
    )

    ours = {
        (r["event_type"], r["q"]): r["exact_quantile"]
        for r in exact_quantiles_two_pass(spark, SF).collect()
    }
    ev = T(spark, SF, "events").filter(F.col("value").isNotNull())
    native = {
        (r["event_type"], q): r["p"]
        for q in (0.5, 0.9)
        for r in ev.groupBy("event_type")
        .agg(F.expr(f"percentile(value, {q}d)").alias("p"))
        .collect()
    }
    assert set(ours) == set(native)
    for k, v in ours.items():
        assert v == pytest.approx(native[k], rel=1e-12, abs=1e-12), k


def test_robust_mad_matches_numpy(spark):
    import numpy as np

    from datalakes_and_data_integration_spark.plans._util import T
    from datalakes_and_data_integration_spark.plans.curation3 import (
        robust_scaling_mad,
    )

    ours = {
        r["event_type"]: r for r in robust_scaling_mad(spark, SF).collect()
    }
    pdf = (
        T(spark, SF, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
        .toPandas()  # scale-ok: test-only, sf0.001
    )
    for et, grp in pdf.groupby("event_type"):
        v = grp["value"].to_numpy()
        med = float(np.median(v))
        mad = float(np.median(np.abs(v - med)))
        r = ours[et]
        assert r["med"] == pytest.approx(med, abs=1e-12)
        assert r["mad"] == pytest.approx(mad, abs=1e-12)
        assert r["n_outliers"] == int(
            (np.abs(v - med) > 3 * 1.4826 * mad).sum()
        )


def test_passage_rewrite_identity_for_all_kept_docs(spark):
    from datalakes_and_data_integration_spark.plans._util import T
    from datalakes_and_data_integration_spark.plans.curation3 import (
        _TOK_SPARK,
        passage_dedup_rewrite,
    )

    out = passage_dedup_rewrite(spark, SF)
    d = T(spark, SF, "documents")
    # For a document that kept ALL its passages, the rewrite must equal
    # the original tokenized text verbatim (md5 of the space-joined
    # tokens) — splitting and reassembly are lossless.
    full = d.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.expr(_TOK_SPARK))).alias("orig_md5"),
    )
    intact = out.filter(F.col("n_kept") == F.col("n_passages")).join(
        full, "doc_id"
    )
    assert intact.count() > 0
    assert (
        intact.filter(F.col("rebuilt_md5") != F.col("orig_md5")).count() == 0
    )


def test_bpe_merges_monotone_and_distinct(spark):
    from datalakes_and_data_integration_spark.plans.curation3 import (
        _BPE_ROUNDS,
        bpe_merge_learning,
    )

    rows = sorted(
        bpe_merge_learning(spark, SF).collect(),
        key=lambda r: r["merge_round"],
    )
    assert [r["merge_round"] for r in rows] == list(
        range(1, _BPE_ROUNDS + 1)
    )
    # Each round picks the global max pair count; merging can only create
    # pairs bounded by the merged pair's count, so the chosen counts are
    # non-increasing. All merges must also be distinct pairs.
    counts = [r["pair_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(c > 0 for c in counts)
    assert len({(r["sym_a"], r["sym_b"]) for r in rows}) == _BPE_ROUNDS
