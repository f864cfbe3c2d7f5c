"""Round-8 first-session newcomers: change-data-feed build, blocked
entity resolution, k-anonymity generalization plan. Invariants beyond
the oracle hash gate (which proves cross-engine equality, not
semantics)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_cdf_emits_paired_update_images_and_no_deletes(spark):
    """The feed must contain NO delete rows (append-only log), every
    update_preimage must pair 1:1 with an update_postimage on the same
    key, inserts are keys absent before the cutoff, and no key appears
    with more than one change kind besides the update pair."""
    from datalakes_and_data_integration_spark.plans.temporal import (
        change_data_feed_build,
    )

    rows = change_data_feed_build(spark, SF).collect()
    assert rows
    by_type: dict[str, set] = {}
    for r in rows:
        by_type.setdefault(r.change_type, set()).add(r.user_id)
        assert r.commit_version == 2
    assert "delete" not in by_type
    pre = by_type.get("update_preimage", set())
    post = by_type.get("update_postimage", set())
    assert pre == post
    ins = by_type.get("insert", set())
    assert not (ins & pre)
    # update rows must actually change the attribute
    attrs: dict[tuple, list] = {}
    for r in rows:
        if r.change_type.startswith("update"):
            attrs.setdefault(r.user_id, {})[r.change_type] = r.attr
    for uid, m in attrs.items():
        assert m["update_preimage"] != m["update_postimage"], uid


def test_cdf_replays_onto_old_state_to_produce_new_state(spark):
    """Applying the feed to the cutoff state must reproduce the current
    state exactly — the property that makes a CDF consumable."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from datalakes_and_data_integration_spark.plans.temporal import (
        _DIFF_CUT_DAYS,
        change_data_feed_build,
        scd2_parse,
    )

    parsed = scd2_parse(spark, SF)
    cut = parsed.agg(
        (F.min("ts") + F.expr(f"INTERVAL {_DIFF_CUT_DAYS} DAYS")).alias("c")
    ).collect()[0].c

    def state(df):
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        return {
            r.user_id: r.attr
            for r in df.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .collect()
        }

    old = state(parsed.filter(F.col("ts") < F.lit(cut)))
    new = state(parsed)
    feed = change_data_feed_build(spark, SF).collect()
    replayed = dict(old)
    for r in feed:
        if r.change_type in ("insert", "update_postimage"):
            replayed[r.user_id] = r.attr
        elif r.change_type == "delete":
            replayed.pop(r.user_id, None)
    assert replayed == new


def test_er_links_are_dominantly_correct_and_classes_consistent(spark):
    """Every dirty record gets exactly one output row; scores match the
    class thresholds; and ground-truth precision of the 'match' class
    must be high (the perturbation is mild by construction)."""
    from datalakes_and_data_integration_spark.plans.relational import (
        _ER_MATCH,
        _ER_PCT,
        _ER_POSSIBLE,
        entity_resolution_blocked,
    )
    from datalakes_and_data_integration_spark.plans._util import T

    rows = entity_resolution_blocked(spark, SF).collect()
    n_cust = T(spark, SF, "customer").count()
    assert len(set(r.rec_id for r in rows)) == len(rows)
    assert 0 < len(rows) < n_cust  # a strict sample of masters
    matches = [r for r in rows if r.match_class == "match"]
    assert matches
    for r in rows:
        if r.match_class == "match":
            assert r.score >= _ER_MATCH
        elif r.match_class == "possible":
            assert _ER_POSSIBLE <= r.score < _ER_MATCH
        elif r.match_class == "non_match":
            assert r.score < _ER_POSSIBLE
        else:
            assert r.match_class == "no_candidate"
    precision = sum(1 for r in matches if r.correct) / len(matches)
    assert precision >= 0.95, precision


def test_kgen_ladder_is_monotone_and_chooses_minimal_level(spark):
    """Class counts must not increase and min class size must not
    decrease up the ladder (each level only merges classes); exactly
    one level is chosen iff any satisfies k, and it is the smallest
    satisfying one; level-0 totals must reconcile with the table."""
    from datalakes_and_data_integration_spark.plans._util import T
    from datalakes_and_data_integration_spark.plans.quality import (
        k_anon_generalization_plan,
    )

    rows = sorted(
        k_anon_generalization_plan(spark, SF).collect(),
        key=lambda r: r.level,
    )
    assert [r.level for r in rows] == [0, 1, 2, 3, 4]
    for a, b in zip(rows, rows[1:]):
        assert b.n_classes <= a.n_classes
        assert b.min_class_size >= a.min_class_size
    for r in rows:
        assert r.satisfies_k == (r.rows_at_risk == 0)
        assert 0 <= r.classes_at_risk <= r.n_classes
    sat = [r.level for r in rows if r.satisfies_k]
    chosen = [r.level for r in rows if r.chosen]
    assert chosen == ([min(sat)] if sat else [])
    assert sat, "the fully generalized tail of the ladder should reach k"
