"""Streaming sketch maintenance: HLL register files merged per batch.

The point of a mergeable sketch (plans/sketches.py) is that INCREMENTAL
maintenance is the same operation as distributed aggregation: each
micro-batch produces a 64-row register file, and merging it into the
persisted state is a per-register max — no rescan of history, state size
O(groups x 64) forever. This is the streaming twin of
``distinct_count_hll``: after any number of batches, the maintained
registers are IDENTICAL to the batch-built registers over the union of
the data (max is associative/commutative/idempotent — redelivered
batches are no-ops).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakes_and_data_integration_spark.functions.hashing import (
    hash60_sql_spark,
)

# plans.sketches is imported INSIDE the functions below, not at module
# level: importing it registers every sketches.py query, and this module
# is itself imported at decoration time by streaming_extra's oracle
# builders — a module-level import here would reorder the registry tail
# relative to the order plans/__init__.py declares (code-review r7 s6).


def hll_registers(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """(group, reg, mrho) register file for distinct ``key_col`` per
    ``group_col`` — same hash family as plans/sketches.distinct_count_hll."""
    from datalakes_and_data_integration_spark.plans.sketches import (
        _HLL_M,
        _HLL_VBITS,
        _rho_case,
    )

    h = hash60_sql_spark(f"CAST({key_col} AS STRING)", seed=7)
    hashed = df.select(
        F.col(group_col).alias("grp"),
        F.expr(f"({h}) % {_HLL_M}").alias("reg"),
        F.expr(f"(({h}) div {_HLL_M}) % {1 << _HLL_VBITS}").alias("val"),
    ).distinct()
    return (
        hashed.select("grp", "reg", F.expr(_rho_case("val")).alias("rho"))
        .groupBy("grp", "reg")
        .agg(F.max("rho").alias("mrho"))
    )


def merge_hll_state(
    spark: SparkSession, state_dir: str, batch_regs: DataFrame
) -> DataFrame:
    """Merge a batch register file into the persisted state: per-(grp,
    reg) max over old + new, rewritten atomically-enough for a single
    writer (stage + swap is operators/upsert's job; state here is tiny).
    Returns the merged registers."""
    if os.path.isdir(state_dir):
        old = spark.read.parquet(state_dir)
        merged = (
            old.unionByName(batch_regs)
            .groupBy("grp", "reg")
            .agg(F.max("mrho").alias("mrho"))
        )
    else:
        merged = batch_regs
    rows = merged.collect()  # scale-ok: O(groups x 64) register rows
    spark.createDataFrame(rows, merged.schema).write.mode(
        "overwrite"
    ).parquet(state_dir)
    return spark.read.parquet(state_dir)


def hll_estimate(regs: DataFrame) -> DataFrame:
    """(grp, hll_est) corrected estimates from a register file — routed
    through plans/sketches' hll_sum_aggs/hll_corrected_col so the
    maintained estimate can never fork from the query-path one."""
    from datalakes_and_data_integration_spark.plans.sketches import (
        hll_corrected_col,
        hll_sum_aggs,
    )

    return (
        regs.groupBy("grp")
        .agg(*hll_sum_aggs())
        .select("grp", F.round(hll_corrected_col(), 4).alias("hll_est"))
    )


# --------------------------------------------------------------------------
# Count-min sketch maintenance. Unlike HLL (max-merge: idempotent, a
# redelivered batch is a no-op by algebra), CMS merge is bucket-wise SUM —
# re-applying a batch double-counts. Exactly-once therefore needs an
# explicit applied-batch ledger next to the state: the merge is a no-op
# for a batch id the ledger has seen. This is the real design difference
# between the two sketch families' streaming maintenance, and the reason
# Structured Streaming's own state store tracks batch ids.
# --------------------------------------------------------------------------

_CMS_MAINT_D = 4
_CMS_MAINT_W = 1024
_CMS_MAINT_SEED0 = 140  # disjoint from the batch CMS family (100..103)


# Kirsch-Mitzenmacher double hashing: ONE md5 per key yields all d row
# buckets as (h1 + s*h2) % w (h2 forced odd so a power-of-two w is fully
# covered) — the same trick the MinHash band family uses. Combined with
# per-key pre-aggregation below, the hash work per batch is O(distinct
# keys), not O(rows x d): the first ladder cut of this query measured
# 4 md5s per RAW event (6.7 s / 25.7 s at 100k / 1m events).
_CMS_H_SPLIT = 1 << 30


def _cms_bucket_exprs(h_col: str) -> list:
    return [
        F.expr(
            f"(({h_col} % {_CMS_H_SPLIT}) + {s} * "
            f"(({h_col} div {_CMS_H_SPLIT}) | 1)) % {_CMS_MAINT_W}"
        )
        for s in range(_CMS_MAINT_D)
    ]


def cms_rows(
    df: DataFrame, key_col: str, extra: tuple[str, ...] = ()
) -> DataFrame:
    """(seed, bucket, total) CMS increment for the batch: per-key counts
    first (map-side combined — rows never carry hashes), then one md5
    per distinct key fanned into the d double-hashed buckets, summed.
    Mergeable by summing. ``extra`` names pass-through grouping columns
    (the batched maintenance path labels rows with a batch id and
    builds every weekly increment in one scan); the default path's
    plan is unchanged."""
    keyed = (
        df.groupBy(*extra, F.col(key_col).cast("string").alias("k"))
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "h", F.expr(hash60_sql_spark("k", seed=_CMS_MAINT_SEED0))
        )
    )
    return (
        keyed.select(
            *extra,
            "cnt",
            F.posexplode(F.array(*_cms_bucket_exprs("h"))).alias(
                "seed", "bucket"
            ),
        )
        .groupBy(*extra, "seed", "bucket")
        .agg(F.sum("cnt").alias("total"))
    )


def ledgered_sum_merge(
    spark: SparkSession,
    state_dir: str,
    batch: DataFrame,
    batch_id: int,
    key_cols: list[str],
    sum_cols: list[str],
    collect_note: str = "bounded state rows",
) -> DataFrame:
    """Generic exactly-once SUM-merge of a batch frame into persisted
    state. Sum-merge is NOT idempotent (unlike HLL's max / bitmap's
    OR), so exactly-once lives in an applied-batch ledger — and the
    state parquet and that ledger COMMIT TOGETHER: the merged state
    stages into a fresh versioned directory and one atomic
    ``os.replace`` of the commit file flips the active-state pointer
    and the applied set in the same step. A crash anywhere leaves the
    previous consistent (state, ledger) pair on disk and replay simply
    re-merges the batch — no window where state already contains a
    batch the ledger hasn't recorded (the double-count crash window of
    the two-step write; ADVICE r7). A replayed id returns the state
    untouched (pinned by tests for both consumers: the CMS sketch and
    the A/B per-user metric state)."""
    return _ledgered_merge(
        spark,
        state_dir,
        batch,
        batch_id,
        key_cols,
        [F.sum(c).alias(c) for c in sum_cols],
        collect_note,
    )


def ledgered_minmax_merge(
    spark: SparkSession,
    state_dir: str,
    batch: DataFrame,
    batch_id: int,
    key_cols: list[str],
    min_cols: list[str],
    max_cols: list[str],
    collect_note: str = "bounded state rows",
) -> DataFrame:
    """Min/max-merge a batch frame into persisted state — the
    IDEMPOTENT member of the merge-algebra family (HLL max, bitmap OR,
    CMS/metric sum, and now per-key min/max): min and max are
    associative, commutative AND idempotent, so a redelivered batch is
    a no-op BY ALGEBRA — the applied-batch ledger this shares with
    ``ledgered_sum_merge`` is a skip-work optimization and an
    observability record, not a correctness requirement (pinned by a
    test that force-remerges a batch past the ledger and gets
    byte-identical state). The staged-commit atomicity still matters:
    a torn write of the state parquet itself would corrupt state
    regardless of algebra, so the same one-``os.replace`` commit flip
    applies."""
    return _ledgered_merge(
        spark,
        state_dir,
        batch,
        batch_id,
        key_cols,
        [F.min(c).alias(c) for c in min_cols]
        + [F.max(c).alias(c) for c in max_cols],
        collect_note,
    )


def ledgered_sum_merge_batched(
    spark: SparkSession,
    state_dir: str,
    increments: DataFrame,
    batch_ids: list[int],
    key_cols: list[str],
    sum_cols: list[str],
    bid_col: str = "__bid",
    collect_note: str = "bounded state rows",
) -> DataFrame:
    """Apply MANY sum-merge batches in ONE state transition.

    ``increments`` carries every batch's key-grouped increment rows,
    labeled by ``bid_col`` (one label per entry of ``batch_ids``; a
    batch with no rows is still recorded as applied — exactly like
    sequentially merging its empty frame). Equivalence to the
    sequential ``ledgered_sum_merge`` fold is algebra, not luck: SUM
    over exact decimals/longs is associative and commutative, so
    `groupBy(keys).sum` over (state ∪ all unapplied increments) lands
    on the identical state the per-batch fold reaches — pinned
    value-identical by tests/test_r10_opt.py. Already-applied ids are
    filtered OUT before the merge (replay keeps exactly-once), and the
    commit records every newly applied id atomically with the state,
    same staged-commit machinery as the per-batch form. The point
    (guide §2.4, VERDICT r9 #1): the per-batch fold pays the fixed
    job-round floor (collect + parquet write + read) once PER BATCH;
    this pays it once per replay point."""
    return _ledgered_merge_batched(
        spark,
        state_dir,
        increments,
        batch_ids,
        key_cols,
        [F.sum(c).alias(c) for c in sum_cols],
        bid_col,
        collect_note,
    )


def ledgered_minmax_merge_batched(
    spark: SparkSession,
    state_dir: str,
    increments: DataFrame,
    batch_ids: list[int],
    key_cols: list[str],
    min_cols: list[str],
    max_cols: list[str],
    bid_col: str = "__bid",
    collect_note: str = "bounded state rows",
) -> DataFrame:
    """Batched twin of ``ledgered_minmax_merge`` — min/max are
    associative, commutative AND idempotent, so the one-transition
    merge is equal to the per-batch fold by even stronger algebra
    than the sum case (duplicate delivery inside ``increments`` would
    not even matter)."""
    return _ledgered_merge_batched(
        spark,
        state_dir,
        increments,
        batch_ids,
        key_cols,
        [F.min(c).alias(c) for c in min_cols]
        + [F.max(c).alias(c) for c in max_cols],
        bid_col,
        collect_note,
    )


def _ledgered_merge_batched(
    spark: SparkSession,
    state_dir: str,
    increments: DataFrame,
    batch_ids: list[int],
    key_cols: list[str],
    agg_exprs: list,
    bid_col: str,
    collect_note: str,
) -> DataFrame:
    """One staged-commit state transition applying every unapplied id
    in ``batch_ids``: filter ``increments`` to the unapplied labels,
    union with the current state, ONE groupBy(keys) re-aggregate, ONE
    collect/write/commit. The commit flips the active-state pointer
    and the whole newly-applied id set in a single ``os.replace`` —
    the same crash-consistency contract as ``_ledgered_merge`` (a
    crash before the flip leaves the previous (state, ledger) pair;
    replay re-merges ALL the ids it never recorded)."""
    import json
    import shutil

    os.makedirs(state_dir, exist_ok=True)
    commit_path = os.path.join(state_dir, "COMMIT.json")
    applied: set[str] = set()
    cur_name = None
    if os.path.exists(commit_path):
        with open(commit_path) as fh:
            commit = json.load(fh)
        applied = set(commit["applied"])
        cur_name = commit["sketch"]
    cur_dir = os.path.join(state_dir, cur_name) if cur_name else None
    for entry in os.listdir(state_dir):  # entry GC, as in _ledgered_merge
        if entry.startswith("sketch-") and entry != cur_name:
            shutil.rmtree(
                os.path.join(state_dir, entry), ignore_errors=True
            )
    new_ids = [b for b in batch_ids if str(b) not in applied]
    if not new_ids:
        return spark.read.parquet(cur_dir)
    inc = increments.filter(
        F.col(bid_col).isin([*new_ids])
    ).drop(bid_col)
    if cur_dir is not None:
        merged = (
            spark.read.parquet(cur_dir)
            .unionByName(inc)
            .groupBy(*key_cols)
            .agg(*agg_exprs)
        )
    else:
        merged = inc.groupBy(*key_cols).agg(*agg_exprs)
    rows = merged.collect()  # scale-ok: see collect_note per consumer
    _ = collect_note
    new_name = f"sketch-{len(applied):06d}-{max(new_ids)}"
    new_dir = os.path.join(state_dir, new_name)
    spark.createDataFrame(rows, merged.schema).write.mode(
        "overwrite"
    ).parquet(new_dir)
    tmp = commit_path + ".staged"
    with open(tmp, "w") as fh:
        json.dump(
            {
                "applied": sorted(
                    applied | {str(b) for b in new_ids}
                ),
                "sketch": new_name,
            },
            fh,
        )
    os.replace(tmp, commit_path)  # the atomic commit point
    if cur_dir is not None:  # superseded generation, post-commit GC
        shutil.rmtree(cur_dir, ignore_errors=True)
    return spark.read.parquet(new_dir)


def _ledgered_merge(
    spark: SparkSession,
    state_dir: str,
    batch: DataFrame,
    batch_id: int,
    key_cols: list[str],
    agg_exprs: list,
    collect_note: str = "bounded state rows",
) -> DataFrame:
    """Shared staging/commit machinery for the ledgered merges: one
    versioned state directory, one COMMIT.json flipped by a single
    ``os.replace`` carrying both the active-state pointer and the
    applied-batch set, entry GC of uncommitted stage dirs."""
    import json
    import shutil

    os.makedirs(state_dir, exist_ok=True)
    commit_path = os.path.join(state_dir, "COMMIT.json")
    applied: set[str] = set()
    cur_name = None
    if os.path.exists(commit_path):
        with open(commit_path) as fh:
            commit = json.load(fh)
        applied = set(commit["applied"])
        cur_name = commit["sketch"]
    cur_dir = os.path.join(state_dir, cur_name) if cur_name else None
    # Entry GC (ADVICE r8): a crash between the staged parquet write and
    # the os.replace commit leaves an orphaned sketch-* dir, and a retry
    # under a DIFFERENT batch id stages a different name — so orphans
    # would accumulate across crash/replay cycles. Anything not named by
    # COMMIT.json is by definition uncommitted garbage; removing it here
    # restores the bounded-state-dir invariant before we stage anew.
    for entry in os.listdir(state_dir):
        if entry.startswith("sketch-") and entry != cur_name:
            shutil.rmtree(
                os.path.join(state_dir, entry), ignore_errors=True
            )
    if str(batch_id) in applied:
        return spark.read.parquet(cur_dir)
    if cur_dir is not None:
        merged = (
            spark.read.parquet(cur_dir)
            .unionByName(batch)
            .groupBy(*key_cols)
            .agg(*agg_exprs)
        )
    else:
        merged = batch
    rows = merged.collect()  # scale-ok: see collect_note per consumer
    _ = collect_note
    new_name = f"sketch-{len(applied):06d}-{batch_id}"
    new_dir = os.path.join(state_dir, new_name)
    spark.createDataFrame(rows, merged.schema).write.mode(
        "overwrite"
    ).parquet(new_dir)
    tmp = commit_path + ".staged"
    with open(tmp, "w") as fh:
        json.dump(
            {
                "applied": sorted(applied | {str(batch_id)}),
                "sketch": new_name,
            },
            fh,
        )
    os.replace(tmp, commit_path)  # the atomic commit point
    if cur_dir is not None:  # superseded generation, post-commit GC
        shutil.rmtree(cur_dir, ignore_errors=True)
    return spark.read.parquet(new_dir)


def merge_cms_state(
    spark: SparkSession, state_dir: str, batch: DataFrame, batch_id: int
) -> DataFrame:
    """Sum-merge a batch's CMS rows into the persisted sketch, exactly
    once, via the shared staged-commit ledger (ledgered_sum_merge).
    State is O(d x w) rows (<= 4096) forever."""
    return ledgered_sum_merge(
        spark,
        state_dir,
        batch,
        batch_id,
        key_cols=["seed", "bucket"],
        sum_cols=["total"],
        collect_note="O(d x w) sketch rows (<= 4096)",
    )


def cms_lookup(keys: DataFrame, sketch: DataFrame, key_col: str) -> DataFrame:
    """min-over-d-rows CMS estimates for ``keys``: one equi-join on
    (seed, bucket) probes all d rows per key (the heavy_hitters_cms
    single-join form), then min() realizes the estimate."""
    probed = keys.withColumn(
        "h",
        F.expr(
            hash60_sql_spark(
                f"CAST({key_col} AS STRING)", seed=_CMS_MAINT_SEED0
            )
        ),
    ).select(
        *keys.columns,
        F.posexplode(F.array(*_cms_bucket_exprs("h"))).alias(
            "seed", "bucket"
        ),
    )
    # LEFT join: a probed (seed, bucket) with no sketch row means no key
    # ever hashed there — its count is 0, and the CMS min must see it
    # (an inner join would drop never-seen keys entirely, or overstate
    # keys with only some empty buckets; code-review r7 s6).
    return (
        probed.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        .groupBy(*keys.columns)
        .agg(
            F.min(F.coalesce("total", F.lit(0).cast("long"))).alias(
                "cms_est"
            )
        )
    )


# --------------------------------------------------------------------------
# Exact-distinct bitmap maintenance — the third merge algebra next to HLL
# (max: idempotent, approximate) and CMS (sum: NOT idempotent, needs the
# ledger): bit_or is idempotent AND exact. Redelivered batches are no-ops
# by algebra, no ledger required — the triptych is the whole design space
# of streaming sketch maintenance.
# --------------------------------------------------------------------------


def bitmap_words(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """(grp, w, bits) word file — delegates to plans/sketches'
    bitmap_word_rows (the single copy of the idiom) so maintained state
    and query path are provably the same construction."""
    from datalakes_and_data_integration_spark.plans.sketches import (
        bitmap_word_rows,
    )

    return bitmap_word_rows(df, group_col, key_col)


def merge_bitmap_state_batched(
    spark: SparkSession, state_dir: str, increments: DataFrame
) -> DataFrame:
    """bit_or-merge MANY batch word files (one frame holding every
    increment's rows — several rows per (grp, w) are expected) into
    the persisted state in ONE transition. Unlike the per-batch
    ``merge_bitmap_state`` — whose no-prior-state path can adopt the
    already-grouped batch as-is — this ALWAYS re-ORs, because the
    combined increments are not a grouped word file. bit_or is
    associative and idempotent, so one transition equals the
    per-batch fold by algebra (guide §2.4 / VERDICT r9 #1)."""
    inc = increments
    if os.path.isdir(state_dir):
        inc = spark.read.parquet(state_dir).unionByName(inc)
    merged = inc.groupBy("grp", "w").agg(F.expr("bit_or(bits)").alias("bits"))
    rows = merged.collect()  # scale-ok: word-compressed state (63 keys/row)
    spark.createDataFrame(rows, merged.schema).write.mode(
        "overwrite"
    ).parquet(state_dir)
    return spark.read.parquet(state_dir)


def merge_bitmap_state(
    spark: SparkSession, state_dir: str, batch: DataFrame
) -> DataFrame:
    """bit_or-merge a batch word file into the persisted state. No
    ledger: OR is idempotent, a redelivered batch changes nothing
    (pinned by test). State is O(groups x |key domain|/63) rows."""
    if os.path.isdir(state_dir):
        merged = (
            spark.read.parquet(state_dir)
            .unionByName(batch)
            .groupBy("grp", "w")
            .agg(F.expr("bit_or(bits)").alias("bits"))
        )
    else:
        merged = batch
    rows = merged.collect()  # scale-ok: word-compressed state (63 keys/row)
    spark.createDataFrame(rows, merged.schema).write.mode(
        "overwrite"
    ).parquet(state_dir)
    return spark.read.parquet(state_dir)
