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


def test_cdc_merge_planted_fixture_exercises_all_five_actions(spark, tmp_path):
    """The production corpus never yields 'carryover' (every user is
    active in the final week), so the five merge actions are pinned on a
    planted change log: one user per action class, with the tombstone
    NULLing the payload and a delete-then-reinsert landing as 'insert'."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from datalakes_and_data_integration_spark.plans.temporal import (
        cdc_merge_apply,
    )

    t0 = dt.datetime(2024, 1, 1)
    old = t0  # pre-cutoff (max ts = Jan 20; cutoff = Jan 13)
    new = t0 + dt.timedelta(days=19)
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, old, 1, "signup", 1.0, '{"k": 10}'),   # carryover: no src ops
        (2, old, 2, "signup", 2.0, '{"k": 20}'),
        (3, new, 2, "click", 2.5, '{"k": 21}'),    # update
        (4, old, 3, "signup", 3.0, '{"k": 30}'),
        (5, new, 3, "error", None, None),          # delete (tombstone)
        (6, old, 4, "error", None, None),          # absent from target...
        (7, new, 4, "view", 4.5, '{"k": 41}'),     # ...insert (re-create)
        (8, new, 5, "error", None, None),          # noop: delete of absent
        (9, new, 9, "purchase", 9.0, None),        # max-ts anchor row
    ]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows]),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))

    got = {
        r.user_id: r for r in cdc_merge_apply(spark, str(tmp_path)).collect()
    }
    assert {u: r.action for u, r in got.items()} == {
        1: "carryover", 2: "update", 3: "delete", 4: "insert",
        5: "noop", 9: "insert",
    }
    assert (got[1].final_k, got[1].final_value) == (10, 1.0)
    assert (got[2].final_k, got[2].final_value) == (21, 2.5)
    assert got[3].final_k is None and got[3].final_value is None
    assert (got[4].final_k, got[4].final_value) == (41, 4.5)
    assert got[5].final_k is None
    assert got[9].final_k is None and got[9].final_value == 9.0
    assert got[2].n_src_ops == 1 and got[1].n_src_ops == 0


def test_code_switch_planted_multilingual_doc(spark, tmp_path):
    """The shipped corpus only ever mixes en <-> und (its texts carry no
    non-English stopwords), so true multilingual switching is pinned on a
    planted document: three 10-token segments en | de | es must yield 2
    switches, dominance by the fixed tiebreak order, and is_mixed; a pure
    one-segment doc and an empty doc pin the degenerate branches."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datalakes_and_data_integration_spark.plans.text import (
        doc_code_switch_profile,
    )

    en = "the a of and to in is that it for"          # 10 en stopwords
    de = "der die das und ist nicht ein zu mit auf"   # 10 de stopwords
    es = "el la que y en un es por con de"            # 10 es stopwords
    docs = {
        1: f"{en} {de} {es}",  # en | de | es -> 2 switches, mixed
        2: en,                 # single pure segment
        3: "zzz qqq www",      # no stopwords -> und
    }
    table = pa.table(
        {
            "doc_id": pa.array(list(docs), pa.int64()),
            "text": pa.array(list(docs.values())),
            "lang": pa.array(["en", "en", "en"]),
            "source": pa.array(["syn"] * 3),
            "n_chars": pa.array([len(v) for v in docs.values()], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))

    got = {
        r.doc_id: r
        for r in doc_code_switch_profile(spark, str(tmp_path)).collect()
    }
    r1 = got[1]
    assert (r1.n_segments, r1.n_switches, r1.is_mixed) == (3, 2, True)
    # 'de' segment: 'de' is ALSO an es/fr stopword -> each segment scores
    # its own language 10, so dominance falls to the tiebreak order (en).
    assert r1.dominant_lang == "en"
    assert r1.dominant_per_mille == 333
    r2 = got[2]
    assert (r2.n_segments, r2.n_switches, r2.dominant_lang,
            r2.dominant_per_mille, r2.is_mixed) == (1, 0, "en", 1000, False)
    r3 = got[3]
    assert (r3.dominant_lang, r3.is_mixed) == ("und", False)


def test_weight_preservation_identity_and_nonvacuity(spark):
    """The global preservation identity — sum of assigned weights equals
    the corpus doc count (every cluster contributes its full sample mass
    through its upweighted representative) — plus non-vacuity: at least
    one representative carries weight > 1."""
    from pyspark.sql import functions as F2

    from datalakes_and_data_integration_spark.plans._util import T
    from datalakes_and_data_integration_spark.plans.curation5 import (
        dedup_weight_preservation,
    )

    rep = dedup_weight_preservation(spark, SF)
    tot = rep.agg(
        F2.sum("sum_weight").alias("w"),
        F2.sum("n_docs").alias("d"),
        F2.sum("n_kept").alias("k"),
    ).collect()[0]
    n_docs = T(spark, SF, "documents").count()
    assert tot.w == tot.d == n_docs
    assert tot.k < n_docs  # non-vacuous: some cluster has size > 1


def test_keyframe_dedup_banding_is_complete_vs_bruteforce(spark):
    """The 3-band pigeonhole must find EVERY frame pair within hamming 2
    (any such pair leaves one 7/7/6-bit band untouched), so the query's
    video-level report must equal a brute-force recompute over all frame
    pairs — verified on the full sf0.001 corpus, plus non-vacuity (some
    hamming-0 pair, some >= 2-frame near-dup verdict)."""
    from collections import defaultdict

    from pyspark.sql import functions as F2

    from datalakes_and_data_integration_spark.operators.multimodal import (
        attach_payload,
        frame_phash,
    )
    from datalakes_and_data_integration_spark.plans._util import T
    from datalakes_and_data_integration_spark.plans.multimodal import (
        _KF_MIN_MATCHES,
        multimodal_keyframe_phash_dedup,
    )

    vids = T(spark, SF, "documents").filter(F2.col("doc_id") % 3 == 2)
    frames = frame_phash(attach_payload(vids)).collect()
    by_vid = defaultdict(list)
    for r in frames:
        by_vid[r.doc_id].append(r.phash)
    expected = {}
    vid_ids = sorted(by_vid)
    for i, va in enumerate(vid_ids):
        for vb in vid_ids[i + 1:]:
            hams = [
                bin(pa ^ pb).count("1")
                for pa in by_vid[va]
                for pb in by_vid[vb]
                if bin(pa ^ pb).count("1") <= 2
            ]
            if hams:
                expected[(va, vb)] = (
                    len(hams), min(hams), len(hams) >= _KF_MIN_MATCHES
                )

    got = {
        (r.vid_a, r.vid_b): (r.n_frame_pairs, r.min_hamming, r.is_near_dup)
        for r in multimodal_keyframe_phash_dedup(spark, SF).collect()
    }
    assert got == expected
    assert any(v[1] == 0 for v in got.values())
    assert any(v[2] for v in got.values())


def test_nprobe_curve_is_monotone_and_bounded(spark):
    """Candidate sets nest in nprobe (probing more lists only adds
    candidates), so recall@5 must be monotone non-decreasing, end at the
    production probe-6 level (>= 0.8 at this SF per the IVF recall pin),
    and never exceed 5 hits per query."""
    from datalakes_and_data_integration_spark.plans.similarity_extra import (
        ann_nprobe_recall_curve,
    )

    rows = sorted(
        ann_nprobe_recall_curve(spark, SF).collect(), key=lambda r: r.nprobe
    )
    assert [r.nprobe for r in rows] == [1, 2, 4, 6]
    for lo, hi in zip(rows, rows[1:]):
        assert hi.hits >= lo.hits
        assert lo.n_queries == hi.n_queries
    assert all(r.hits <= 5 * r.n_queries for r in rows)
    assert rows[-1].recall_permille >= 800
    assert rows[0].recall_permille < rows[-1].recall_permille  # non-flat


def test_cdc_merge_is_input_order_invariant(spark, tmp_path):
    """The merge verdict depends only on the (ts, event_id) TOTAL ORDER,
    never on physical row order — a shuffled rewrite of the same change
    log must produce the identical merged dimension (at 100 TB arrival
    order is arbitrary across files/partitions)."""
    import pyarrow.parquet as pq

    from datalakes_and_data_integration_spark.plans.temporal import (
        cdc_merge_apply,
    )

    t = pq.read_table(f"{SF}/events.parquet")
    import hashlib

    order = sorted(
        range(t.num_rows),
        key=lambda i: hashlib.md5(str(i).encode()).hexdigest(),
    )
    pq.write_table(t.take(order), str(tmp_path / "events.parquet"))

    key = lambda r: tuple(str(x) for x in r)
    base = sorted(map(key, cdc_merge_apply(spark, SF).collect()))
    shuf = sorted(map(key, cdc_merge_apply(spark, str(tmp_path)).collect()))
    assert base == shuf and len(base) > 0


def test_watermark_two_pass_survives_ties_and_bucket_boundaries(
    spark, tmp_path
):
    """Adversarial arrival structure for the bucketed prefix max: event
    ids searched so injected delays COLLIDE (equal arrival micros, the
    event_id tiebreak decides), timestamps pinned to exact hour-bucket
    edges, plus a same-ts burst — the cases where a bucket-boundary or
    tie-handling bug would live. Two-pass must equal the naive global
    window on this fixture exactly."""
    import datetime as dt
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import Window
    from pyspark.sql import functions as F2

    from datalakes_and_data_integration_spark.functions.hashing import (
        hash60_seeded,
    )
    from datalakes_and_data_integration_spark.plans._util import T
    from datalakes_and_data_integration_spark.plans.timeseries import (
        _WM_CANDIDATES,
        _WM_DELAY_MOD,
        _WM_SEED,
        watermark_lateness_profile,
    )

    def delay(eid: int) -> int:
        h = hashlib.md5(f"{_WM_SEED}|{eid}".encode()).hexdigest()[:15]
        return int(h, 16) % _WM_DELAY_MOD

    # find event-id pairs with colliding delays
    by_d = {}
    collisions = []
    for eid in range(1, 4000):
        by_d.setdefault(delay(eid), []).append(eid)
    collisions = [ids for ids in by_d.values() if len(ids) >= 3][:20]
    assert collisions, "delay collisions must exist in a 600-value range"

    t0 = dt.datetime(2024, 1, 1)  # epoch-aligned -> exact hour edges
    rows = []
    for g, ids in enumerate(collisions):
        # same ts + same delay -> identical arrival micros (tiebreak path);
        # ts exactly on an hour edge half the time (bucket-boundary path)
        ts = t0 + dt.timedelta(hours=g) if g % 2 == 0 else (
            t0 + dt.timedelta(hours=g, minutes=59, seconds=59)
        )
        rows += [(eid, ts) for eid in ids]
    # a same-ts burst with DIFFERENT delays (arrivals spread over buckets)
    burst_ts = t0 + dt.timedelta(hours=50)
    rows += [(9000 + i, burst_ts) for i in range(64)]

    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array([None] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))

    got = {
        r.wm_delay_s: r.n_dropped
        for r in watermark_lateness_profile(spark, str(tmp_path)).collect()
    }
    e = T(spark, str(tmp_path), "events").select(
        "event_id",
        F2.unix_micros("ts").alias("t"),
        (
            F2.unix_micros("ts")
            + (
                hash60_seeded(F2.col("event_id").cast("string"), _WM_SEED)
                % _WM_DELAY_MOD
            )
            * 1_000_000
        ).alias("a"),
    )
    w = Window.orderBy("a", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )  # scale-ok: test-only naive reference on the planted fixture
    naive = e.select(
        (
            F2.greatest(
                F2.coalesce(F2.max("t").over(w), F2.col("t")), F2.col("t")
            )
            - F2.col("t")
        ).alias("late_us")
    )
    for d in _WM_CANDIDATES:
        n = naive.filter(F2.col("late_us") > d * 1_000_000).count()
        assert n == got[d], f"wm={d}: naive {n} != two-pass {got[d]}"
    assert got[0] > 0  # the fixture actually creates disorder
