"""TPC-H-style headline queries over the star schema.

These exercise the relational core — scan, filter-pushdown, partial
aggregation, broadcast vs shuffle join selection, top-k — and are the bench
headliners. The reference project has no declarative queries at all
(SURVEY.md §3: every "query" is an imperative script); these restate its
scan→filter→aggregate→join capability surface declaratively so Catalyst
supplies pushdown/pruning/join-choice (SURVEY.md §4).

Scale notes (100 TB design point):
- q1: single shuffle with map-side partial agg; group cardinality tiny (≤ 8
  groups) so the shuffle carries only partial aggregates.
- q3/q5: fact-fact joins shuffle on the join key; dim tables (region, nation,
  customer at small SF — customer is fact-scale at 100 TB and is left to
  AQE) broadcast under autoBroadcastJoinThreshold.
- Top-k uses sort-limit which Spark executes as a per-partition partial top-k
  + single-reduce, not a global sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datalakes_and_data_integration_spark.plans._util import PRICE, QTY, RATE, T, dec
from datalakes_and_data_integration_spark.plans.registry import register

# ---------------------------------------------------------------------------
# q1 — pricing summary (scan + group-by aggregate, the TPC-H Q1 shape)
# ---------------------------------------------------------------------------

_Q1_CUT = "1998-09-02 00:00:00"


@register(
    "tpch_q1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      -- DECIMAL(25,2) forces DuckDB onto int128 for the product (its result
      -- precision is min(p1+p2, 38) but the *storage* stays int64 when both
      -- operands fit int64, which overflows); values are exact either way.
      -- ROUND(..., 4) before the double cast: a scale-4 decimal under 2^53
      -- converts to double identically in both engines; a scale-14 int128
      -- does not (DuckDB's conversion is not correctly rounded).
      CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(25,2))
               * (1 - CAST(l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE) AS sum_disc_price,
      CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(25,2))
               * (1 - CAST(l_discount AS DECIMAL(8,6)))
               * (1 + CAST(l_tax AS DECIMAL(8,6)))), 4) AS DOUBLE) AS sum_charge,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
      CAST(sum(CAST(l_discount AS DECIMAL(8,6))) AS DOUBLE) / count(*) AS avg_disc,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q1_CUT}'
    GROUP BY l_returnflag, l_linestatus
    """,
    description="Pricing summary report: grouped sums/averages over lineitem "
    "with a date predicate (pushed to the parquet scan).",
    tags=("aggregate", "scan", "bench"),
    bench=True,
)
def q1(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit(_Q1_CUT))
    disc_price = dec("l_extendedprice", *PRICE) * (1 - dec("l_discount", *RATE))
    charge = disc_price * (1 + dec("l_tax", *RATE))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity", *QTY)).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice", *PRICE)).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 4).cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity", *QTY)).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(dec("l_extendedprice", *PRICE)).cast("double") / F.count("*")).alias(
                "avg_price"
            ),
            (F.sum(dec("l_discount", *RATE)).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q3 — shipping priority (join + aggregate + deterministic top-k)
# ---------------------------------------------------------------------------

_Q3_DATE = "1998-06-01 00:00:00"


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey, revenue, o_orderdate, o_orderpriority
    FROM (
      SELECT
        l.l_orderkey,
        CAST(ROUND(sum(CAST(l.l_extendedprice AS DECIMAL(25,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE) AS revenue,
        o.o_orderdate,
        o.o_orderpriority
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '{_Q3_DATE}'
        AND l.l_shipdate > TIMESTAMP '{_Q3_DATE}'
      GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    )
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    description="Top-10 unshipped orders by revenue for one market segment; "
    "3-way join with explicit total-order tiebreak (revenue desc, orderkey).",
    tags=("join", "aggregate", "topk", "bench"),
    bench=True,
)
def q3(spark, sf_dir):
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit(_Q3_DATE))
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit(_Q3_DATE))
    revenue = dec("l_extendedprice", *PRICE) * (1 - dec("l_discount", *RATE))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(revenue), 4).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q5 — local supplier volume (6-way join, dim broadcast)
# ---------------------------------------------------------------------------


@register(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT
      n.n_name,
      CAST(ROUND(sum(CAST(l.l_extendedprice AS DECIMAL(25,2))
               * (1 - CAST(l.l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    description="Revenue by nation for intra-region sales: 6-way join; "
    "region/nation/supplier broadcast, fact-fact join shuffles on orderkey.",
    tags=("join", "aggregate", "bench"),
    bench=True,
)
def q5(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00"))
    )
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = dec("l_extendedprice", *PRICE) * (1 - dec("l_discount", *RATE))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue), 4).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# top-k customers by lifetime revenue (agg + broadcast-joined enrich + top-k)
# ---------------------------------------------------------------------------


@register(
    "top_customers_by_revenue",
    oracle="""
    SELECT c_custkey, c_name, n_name, orders_cnt, total_spent
    FROM (
      SELECT
        c.c_custkey, c.c_name, n.n_name,
        count(o.o_orderkey) AS orders_cnt,
        CAST(sum(CAST(o.o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total_spent
      FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY c.c_custkey, c.c_name, n.n_name
    )
    ORDER BY total_spent DESC, c_custkey
    LIMIT 25
    """,
    description="Top-25 customers by lifetime spend, nation-enriched; "
    "aggregate-then-broadcast-enrich ordering keeps the join input small.",
    tags=("join", "aggregate", "topk"),
    bench=True,
)
def top_customers(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    n = T(spark, sf_dir, "nation")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.count("o_orderkey").alias("orders_cnt"),
            F.sum(dec("o_totalprice", *PRICE)).cast("double").alias("total_spent"),
        )
        .orderBy(F.col("total_spent").desc(), F.col("c_custkey"))
        .limit(25)
        .select("c_custkey", "c_name", "n_name", "orders_cnt", "total_spent")
    )
