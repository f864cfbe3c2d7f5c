"""Warehouse-maintenance queries: continuous aggregates, pivot/unpivot,
skew-salted joins.

Registered after the round-2 driver-window cutoff (see plans/__init__.py);
oracle-checked by the local gate and eligible to rotate into the driver
window next round.

The continuous-aggregate query is the scale answer to the reference's
full-recompute curated stage (process_to_curated.py reads the whole
staging table every run): maintain mergeable partials incrementally and
only ever touch the increment — see operators/rollup.py for the design.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datalakes_and_data_integration_spark.plans._util import T, dec
from datalakes_and_data_integration_spark.plans.registry import register

# Daily-rollup maintenance scenario over the 2024-01-01..30 events table:
# history is rolled up once, three daily increments are merged in one at a
# time (the nightly job), and reads serve closed days from the rollup plus
# the still-open tail straight from raw — proving rollup ∪ tail == full
# recompute (the oracle).
_HISTORY_END = "2024-01-25"  # history rollup covers ts < this
_INCREMENT_DAYS = ("2024-01-25", "2024-01-26", "2024-01-27")
_HIGH_WATER = "2024-01-28"  # rollup covers ts < this after maintenance


@register(
    "continuous_aggregate_daily",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           event_type,
           count(*) AS n_events,
           CAST(ROUND(sum(CAST(value AS DECIMAL(27,6))), 4) AS DOUBLE)
             AS total_value,
           CAST(ROUND(CAST(CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE)
                           / count(*) AS DECIMAL(27,12)), 6) AS DOUBLE)
             AS avg_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    GROUP BY day, event_type
    """,
    description="Continuous-aggregate maintenance (operators/rollup.py): "
    "daily (day x event_type) partials — count / exact-decimal sum / min "
    "/ max, all mergeable — built once over history, then three daily "
    "increments merged in generation-swapped parquet (the nightly job), "
    "then served merge-on-read: closed days from the rollup, the open "
    "tail folded in from raw at the partial level. Equals a full "
    "recompute (the oracle) while the maintenance path only ever reads "
    "each increment once. Scale shape: merges shuffle O(days x types) "
    "partial rows with map-side combine, never raw history; the rollup "
    "table is partitioned by day so an increment rewrites one partition.",
    tags=("maintenance", "rollup", "incremental", "timeseries"),
)
def continuous_aggregate_daily(spark, sf_dir):
    import os
    import tempfile

    from datalakes_and_data_integration_spark.operators.rollup import (
        finalize_rollup,
        merge_rollups,
        partial_rollup,
        write_rollup,
    )

    e = T(spark, sf_dir, "events")
    bucket = F.col("ts").cast("date")
    keys = ["event_type"]

    root = tempfile.mkdtemp(prefix="contagg_")
    gen = os.path.join(root, "gen0")
    write_rollup(
        partial_rollup(e.filter(F.col("ts") < _HISTORY_END), bucket, keys),
        gen,
    )
    # Nightly maintenance: merge one day's partials per generation. A new
    # generation dir per merge because parquet can't be overwritten while
    # it is the read side (operators/upsert.py uses the same staged-swap
    # idea with tombstones for in-place tables).
    days = [*_INCREMENT_DAYS, _HIGH_WATER]
    for i, (day, nxt) in enumerate(zip(days, days[1:] + [None])):
        if nxt is None:
            break
        inc = e.filter((F.col("ts") >= day) & (F.col("ts") < nxt))
        merged = merge_rollups(
            spark.read.parquet(gen).withColumn(
                "bucket", F.col("bucket").cast("date")
            ),
            partial_rollup(inc, bucket, keys),
        )
        gen_next = os.path.join(root, f"gen{i + 1}")
        write_rollup(merged, gen_next)
        gen = gen_next

    rolled = spark.read.parquet(gen).withColumn(
        "bucket", F.col("bucket").cast("date")
    )
    # Merge-on-read: the open tail (not yet maintained) at partial level.
    tail = partial_rollup(
        e.filter(F.col("ts") >= _HIGH_WATER), bucket, keys
    )
    return finalize_rollup(merge_rollups(rolled, tail)).withColumnRenamed(
        "bucket", "day"
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "pivot_unpivot_roundtrip",
    oracle="""
    SELECT user_id,
           event_type,
           CAST(ROUND(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE)
             AS total_value
    FROM events
    GROUP BY user_id, event_type
    """,
    description="Wide/long reshaping round-trip: pivot events into one "
    "column per event type (the reference's gold stage is exactly this "
    "wide per-pollutant shape, process_to_curated.py:60-88), then unpivot "
    "back to long with the built-in stack()-based unpivot, dropping the "
    "nulls pivot invented for absent (user, type) combos — equals the "
    "direct long aggregation (the oracle). Scale shape: pivot with an "
    "explicit value list is one shuffle (no distinct-values pre-scan); "
    "unpivot is a narrow map — no extra exchange.",
    tags=("reshape", "pivot", "parity"),
)
def pivot_unpivot_roundtrip(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    wide = (
        e.groupBy("user_id")
        # Explicit value list: without it Spark runs a distinct() pre-scan
        # over the fact table just to learn the column names.
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.round(F.sum(dec("value", 18, 6)), 4).cast("double"))
    )
    long = wide.unpivot(
        ids=["user_id"],
        values=list(_EVENT_TYPES),
        variableColumnName="event_type",
        valueColumnName="total_value",
    )
    return long.filter(F.col("total_value").isNotNull())


@register(
    "skew_salted_join_stats",
    oracle="""
    SELECT n.n_name AS nation,
           count(*) AS n_events,
           CAST(ROUND(sum(CAST(e.value AS DECIMAL(18,6))), 4) AS DOUBLE)
             AS total_value
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY nation
    """,
    description="Skew-safe fact-dim join (operators/skew.py): events "
    "salted 8 ways against the customer dim (exploded per salt), then "
    "nation rollup — identical to the plain join (the oracle), proving "
    "salting is a pure physical rewrite. The events table concentrates "
    "on 150 of 1500 customers (10x hot-key skew by construction). When "
    "AQE skew splitting can't apply (pre-aggregated or pre-partitioned "
    "inputs), this is the explicit form: each hot key spreads over "
    "salt_count tasks at the cost of replicating the dim 8x.",
    tags=("join", "skew", "scale"),
)
def skew_salted_join_stats(spark, sf_dir):
    from datalakes_and_data_integration_spark.operators.skew import salted_join

    e = T(spark, sf_dir, "events").select("user_id", "value")
    c = T(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = salted_join(e, c, on="user_id", salt_count=8)
    return (
        joined.join(F.broadcast(n), joined.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(dec("value", 18, 6)), 4)
            .cast("double")
            .alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# GDPR right-to-be-forgotten delete planning.
# ---------------------------------------------------------------------------

_GDPR_SEED = 17  # seed 13 samples ZERO of sf0.001's 150 customers
_GDPR_PCT = 2  # % of customers requesting erasure (deterministic sample)


def _gdpr_oracle() -> str:
    from datalakes_and_data_integration_spark.functions.hashing import (
        hash60_sql_duck,
    )

    h = hash60_sql_duck("CAST(c_custkey AS VARCHAR)", seed=_GDPR_SEED)
    return f"""
    WITH forget AS MATERIALIZED (
      SELECT c_custkey AS k FROM customer WHERE {h} % 100 < {_GDPR_PCT}
    )
    SELECT 'customer' AS table_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_keys,
           CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_partitions
    FROM customer WHERE c_custkey IN (SELECT k FROM forget)
    UNION ALL
    SELECT 'orders',
           CAST(count(*) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           CAST(count(DISTINCT date_trunc('month', o_orderdate)) AS BIGINT)
    FROM orders WHERE o_custkey IN (SELECT k FROM forget)
    UNION ALL
    SELECT 'events',
           CAST(count(*) AS BIGINT),
           CAST(count(DISTINCT user_id) AS BIGINT),
           CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT)
    FROM events WHERE user_id IN (SELECT k FROM forget)
    """


@register(
    "gdpr_delete_manifest",
    oracle=_gdpr_oracle(),
    description=f"Right-to-be-forgotten delete planning: a deterministic "
    f"{_GDPR_PCT}% erasure-request sample of customers (seeded md5 on "
    "c_custkey) is resolved into a per-table delete manifest — affected "
    "row count, affected key count, and the number of physical "
    "partitions the deletion executor must rewrite (customer bucketed "
    "by nation, orders partitioned by order month, events by event "
    "day). On immutable columnar storage a delete IS a partition "
    "rewrite, so the manifest's n_partitions is the job's real cost "
    "estimate. The forget set is dimension-sized and broadcast: every "
    "fact table is probed by a broadcast LEFT SEMI join — facts never "
    "shuffle — and each branch is one map-side-combined aggregate. "
    "Completes the governance family next to k_anonymity_audit / "
    "l_diversity_audit / text_pii_mask.",
    tags=("maintenance", "governance", "privacy", "audit"),
    bench=True,  # promoted r7: the governance probe (broadcast semi-joins)
)
def gdpr_delete_manifest(spark, sf_dir):
    from datalakes_and_data_integration_spark.functions.hashing import (
        hash60_seeded,
    )

    cust = T(spark, sf_dir, "customer")
    forget = cust.filter(
        hash60_seeded(F.col("c_custkey").cast("string"), _GDPR_SEED) % 100
        < _GDPR_PCT
    ).select(F.col("c_custkey").alias("k"))

    def branch(df, name, key, part_expr):
        hit = df.join(
            F.broadcast(forget), F.col(key) == F.col("k"), "left_semi"
        )
        return hit.agg(
            F.lit(name).alias("table_name"),
            F.count("*").alias("n_rows"),
            F.countDistinct(key).cast("long").alias("n_keys"),
            F.countDistinct(part_expr).cast("long").alias("n_partitions"),
        )

    ev = T(spark, sf_dir, "events")
    return (
        branch(cust, "customer", "c_custkey", F.col("c_nationkey"))
        .unionByName(
            branch(
                T(spark, sf_dir, "orders"),
                "orders",
                "o_custkey",
                F.date_trunc("month", F.col("o_orderdate")),
            )
        )
        .unionByName(
            branch(ev, "events", "user_id", F.col("ts").cast("date"))
        )
    )


# ---------------------------------------------------------------------------
# Z-order clustered layout planning (Delta/Iceberg OPTIMIZE ZORDER shape).
# ---------------------------------------------------------------------------

_Z_FILES = 32
_Z_BITS = 16  # per-dimension quantization width; 2 dims -> 32-bit codes
_Z_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread_sql(expr: str, shift: str) -> str:
    """Bit-spread a 16-bit value so its bits occupy even positions.

    ``shift`` is an engine template for left shift with placeholders
    ``{v}`` and ``{n}`` — Spark lacks ``<<`` but has shiftleft(); DuckDB
    has ``<<``. Masks/adds are plain int64 arithmetic in both.
    """
    v = expr
    for n, mask in _Z_MASKS:
        sh = shift.format(v=v, n=n)
        v = f"(({v} | {sh}) & {mask})"
    return v


def _morton_sql(qx: str, qy: str, shift: str) -> str:
    # Disjoint bit positions, so + == | between the two spread values.
    return f"({_spread_sql(qx, shift)} + 2 * {_spread_sql(qy, shift)})"


_SPARK_SHIFT = "shiftleft({v}, {n})"
_DUCK_SHIFT = "({v} << {n})"


def _zorder_oracle() -> str:
    q = 1 << _Z_BITS
    morton = _morton_sql("qx", "qy", _DUCK_SHIFT)
    return f"""
    WITH base AS (
      SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber,
             (l_partkey * {q}) // (SELECT max(l_partkey) + 1 FROM lineitem)
               AS qx,
             (l_suppkey * {q}) // (SELECT max(l_suppkey) + 1 FROM lineitem)
               AS qy
      FROM lineitem
    ),
    coded AS (SELECT *, {morton} AS z FROM base),
    ranked AS (
      SELECT 'zorder' AS layout, l_partkey, l_suppkey,
             ROW_NUMBER() OVER (ORDER BY z, l_orderkey, l_linenumber) - 1
               AS rank0
      FROM coded
      UNION ALL
      SELECT 'linear' AS layout, l_partkey, l_suppkey,
             ROW_NUMBER()
               OVER (ORDER BY l_partkey, l_orderkey, l_linenumber) - 1
               AS rank0
      FROM coded
    )
    SELECT layout,
           CAST((rank0 * {_Z_FILES}) // (SELECT count(*) FROM lineitem)
                AS BIGINT) AS file_id,
           count(*) AS n_rows,
           min(l_partkey) AS min_partkey, max(l_partkey) AS max_partkey,
           min(l_suppkey) AS min_suppkey, max(l_suppkey) AS max_suppkey
    FROM ranked
    GROUP BY 1, 2
    """


@register(
    "zorder_layout_plan",
    oracle=_zorder_oracle(),
    description="Z-order clustered rewrite planning (the Delta/Iceberg "
    "OPTIMIZE ZORDER shape): lineitem rows get a 32-bit Morton code — "
    "each of (l_partkey, l_suppkey) monotonically quantized to 16 bits, "
    "bits interleaved by the shift-or-mask spread, pure int64 in both "
    "engines — and are packed into 32 equal-row files in code order; the "
    "report is each file's (partkey, suppkey) min/max envelope next to "
    "the single-column LINEAR sort baseline, i.e. exactly the footer "
    "stats a reader prunes on: z-order bounds BOTH dims per file, linear "
    "bounds one and spans the other (pinned by test). Global rank uses "
    "the bucketed two-pass running count (top-8-bits bucket subtotals + "
    "within-bucket row_number; bucket order == code order because the "
    "bucket IS the code's top bits) so no global single-reducer sort "
    "exists in the plan; the oracle is the naive one-window ROW_NUMBER, "
    "and the driver hash match proves the two-pass form equal. At 100 TB "
    "the physical rewrite is repartitionByRange(z) + sortWithinPartitions "
    "(sinks.write_clustered); this query is its planning/audit half.",
    tags=("layout", "maintenance", "zorder", "scale"),
)
def zorder_layout_plan(spark, sf_dir):
    from pyspark.sql import Window

    q = 1 << _Z_BITS
    li = T(spark, sf_dir, "lineitem")
    mx_p, mx_s, n = li.agg(
        F.max("l_partkey"), F.max("l_suppkey"), F.count("*")
    ).collect()[0]  # scale-ok: 3 scalars (quantization bounds + row count)
    morton = _morton_sql("qx", "qy", _SPARK_SHIFT)
    coded = (
        li.select("l_partkey", "l_suppkey", "l_orderkey", "l_linenumber")
        .withColumn("qx", F.expr(f"(l_partkey * {q}) div {mx_p + 1}"))
        .withColumn("qy", F.expr(f"(l_suppkey * {q}) div {mx_s + 1}"))
        .withColumn("z", F.expr(morton))
        .persist()  # two layout passes over the same coded frame
    )

    def layout(name: str, order: list[str], bucket_expr: str):
        d = coded.withColumn("bucket", F.expr(bucket_expr))
        wb = (
            Window.orderBy("bucket")  # scale-ok: offsets frame <= 256 rows (bucket subtotals, not fact rows)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offsets = F.broadcast(
            d.groupBy("bucket")
            .agg(F.count("*").alias("bn"))
            .withColumn(
                "base",
                F.coalesce(F.sum("bn").over(wb), F.lit(0).cast("long")),
            )
            .select("bucket", "base")
        )
        win = Window.partitionBy("bucket").orderBy(*order)
        return (
            d.join(offsets, "bucket")
            .withColumn(
                "rank0", F.col("base") + F.row_number().over(win) - 1
            )
            .select(
                F.lit(name).alias("layout"),
                F.expr(f"(rank0 * {_Z_FILES}) div {n}")
                .cast("long")
                .alias("file_id"),
                "l_partkey",
                "l_suppkey",
            )
        )

    both = layout(
        "zorder", ["z", "l_orderkey", "l_linenumber"],
        f"z div {1 << (2 * _Z_BITS - 8)}",
    ).unionByName(
        layout(
            "linear",
            ["l_partkey", "l_orderkey", "l_linenumber"],
            "qx div 256",
        )
    )
    return both.groupBy("layout", "file_id").agg(
        F.count("*").alias("n_rows"),
        F.min("l_partkey").alias("min_partkey"),
        F.max("l_partkey").alias("max_partkey"),
        F.min("l_suppkey").alias("min_suppkey"),
        F.max("l_suppkey").alias("max_suppkey"),
    )
