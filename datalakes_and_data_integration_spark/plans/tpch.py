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

from datalakes_and_data_integration_spark.plans._util import (
    PRICE,
    QTY,
    RATE,
    T,
    dec,
    spread,
)
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
    # r09 optimization: the single-row-group local file scans as ONE
    # partition, serializing the decimal-heavy partial aggregate; a keyed
    # spread (hash, no sortBeforeRepartition cost) parallelizes it
    # (measured 0.78 -> 0.41 s warm; keyless rr spread only reached 0.63).
    # Keyed by a column q1 already reads so ReadSchema stays minimal.
    # No-op on a real cluster where the scan has >= cores splits.
    li = spread(
        T(spark, sf_dir, "lineitem").filter(
            F.col("l_shipdate") <= F.lit(_Q1_CUT)
        ),
        spark,
        by="l_extendedprice",
    )
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


# ---------------------------------------------------------------------------
# q4 — order priority checking (EXISTS -> left semi join)
# ---------------------------------------------------------------------------

_Q4_LO, _Q4_HI = "1996-01-01 00:00:00", "1996-04-01 00:00:00"


@register(
    "tpch_q4_order_priority",
    oracle=f"""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '{_Q4_LO}'
      AND o.o_orderdate < TIMESTAMP '{_Q4_HI}'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    description="Order counts by priority where at least one line shipped "
    "after the order date (TPC-H Q4 shape): EXISTS decorrelates to a left "
    "semi join on orderkey; the date filter pushes to the orders scan.",
    tags=("join", "semi-join", "aggregate"),
)
def q4(spark, sf_dir):
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q4_LO))
        & (F.col("o_orderdate") < F.lit(_Q4_HI))
    )
    li = T(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# q6 — forecasting revenue change (pure scan + pushed filters, no join)
# ---------------------------------------------------------------------------


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(25,2))
             * CAST(l_discount AS DECIMAL(8,6))), 4) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    description="Revenue from discounted small-quantity lines in one year "
    "(TPC-H Q6 shape): every predicate reaches the parquet scan as a pushed "
    "filter; single global aggregate, no shuffle beyond the final reduce.",
    tags=("aggregate", "scan", "pushdown"),
    bench=True,
)
def q6(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    revenue = dec("l_extendedprice", *PRICE) * dec("l_discount", *RATE)
    return li.agg(F.round(F.sum(revenue), 4).cast("double").alias("revenue"))


# ---------------------------------------------------------------------------
# q10 — returned item reporting (join + aggregate + top-k)
# ---------------------------------------------------------------------------


@register(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, revenue, n_name, c_acctbal
    FROM (
      SELECT c.c_custkey, c.c_name,
             CAST(ROUND(sum(CAST(l.l_extendedprice AS DECIMAL(25,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE)
               AS revenue,
             n.n_name, c.c_acctbal
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        AND l.l_returnflag = 'R'
      GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    )
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    description="Top-20 customers by revenue lost to returns in a half-year "
    "window (TPC-H Q10 shape): returnflag filter pushes to the lineitem "
    "scan; nation broadcasts; top-k is partial-top-k + single reduce.",
    tags=("join", "aggregate", "topk"),
    bench=True,
)
def q10(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00"))
    )
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = T(spark, sf_dir, "nation")
    revenue = dec("l_extendedprice", *PRICE) * (1 - dec("l_discount", *RATE))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.round(F.sum(revenue), 4).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name", "c_acctbal")
    )


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution (left outer join + double group-by)
# ---------------------------------------------------------------------------


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    description="Distribution of per-customer order counts excluding urgent "
    "orders (TPC-H Q13 shape): left outer join keeps order-less customers "
    "(count 0); two grouped aggregations, the second over a tiny domain.",
    tags=("join", "outer-join", "aggregate"),
)
def q13(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


# ---------------------------------------------------------------------------
# q14 — promotion effect (join + conditional aggregate)
# ---------------------------------------------------------------------------


@register(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT CAST(ROUND(
             100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
               THEN CAST(l.l_extendedprice AS DECIMAL(25,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(8,6)))
               ELSE CAST(0 AS DECIMAL(25,2)) END) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(25,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(8,6)))) AS DOUBLE),
           6) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    """,
    description="Percent of one month's revenue from PROMO parts (TPC-H Q14 "
    "shape): part broadcasts against the date-pruned lineitem scan; "
    "conditional decimal aggregate keeps both engines exact.",
    tags=("join", "aggregate", "conditional"),
)
def q14(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00"))
    )
    p = T(spark, sf_dir, "part")
    rev = dec("l_extendedprice", *PRICE) * (1 - dec("l_discount", *RATE))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(25,2)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double"),
                6,
            )
            .cast("double")
            .alias("promo_revenue_pct")
        )
    )


# ---------------------------------------------------------------------------
# q18 — large volume customers (group-HAVING semi join back to facts)
# ---------------------------------------------------------------------------

_Q18_MIN_QTY = 300


@register(
    "tpch_q18_large_orders",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM (
      SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice,
             CAST(sum(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > {_Q18_MIN_QTY}
      )
      GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    )
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    description=f"Orders whose total quantity exceeds {_Q18_MIN_QTY} with "
    "their customers (TPC-H Q18 shape): the HAVING subquery becomes an "
    "aggregate + left semi join on orderkey; exchange on orderkey reused "
    "between the HAVING aggregate and the outer aggregate.",
    tags=("join", "semi-join", "aggregate", "topk"),
    bench=True,
)
def q18(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    # r09 optimization: spread the fact scan BY THE GROUPING KEY — the
    # hash(l_orderkey) exchange is then reused by the HAVING aggregate
    # (no second corpus exchange) and the per-row work parallelizes off
    # the single-row-group scan partition (measured 1.02 -> 0.60 s warm;
    # keyless spread REGRESSED to 1.22 s — the round-robin sort +
    # unreusable partitioning cost more than the serial scan). No-op on
    # a real cluster.
    li = spread(T(spark, sf_dir, "lineitem"), spark, by="l_orderkey")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity", *QTY)).alias("q"))
        .filter(F.col("q") > _Q18_MIN_QTY)
        .select("l_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(big.withColumnRenamed("l_orderkey", "bk"),
              F.col("o_orderkey") == F.col("bk"), "left_semi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(dec("l_quantity", *QTY)).cast("double").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q19 — discounted revenue, disjunctive predicates (OR-of-ANDs join filter)
# ---------------------------------------------------------------------------


@register(
    "tpch_q19_disjunctive_filter",
    oracle="""
    SELECT CAST(ROUND(sum(CAST(l.l_extendedprice AS DECIMAL(25,2))
             * (1 - CAST(l.l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE
      (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
        AND l.l_quantity BETWEEN 1 AND 11)
      OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
        AND l.l_quantity BETWEEN 10 AND 20)
      OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
        AND l.l_quantity BETWEEN 20 AND 30)
    """,
    description="Revenue under an OR-of-ANDs brand/size/quantity predicate "
    "(TPC-H Q19 shape): Catalyst extracts the common join key, broadcasts "
    "part, and evaluates the disjunction as a post-join filter.",
    tags=("join", "aggregate", "disjunction"),
)
def q19(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    revenue = dec("l_extendedprice", *PRICE) * (1 - dec("l_discount", *RATE))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.round(F.sum(revenue), 4).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q22 — global sales opportunity (scalar subquery + anti join)
# ---------------------------------------------------------------------------


@register(
    "tpch_q22_idle_customers",
    oracle="""
    SELECT c_nationkey, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT CAST(avg(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
        FROM customer WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
      )
    GROUP BY c_nationkey
    """,
    description="Well-funded customers with no urgent orders, by nation "
    "(TPC-H Q22 shape; every synthetic customer has some order, so the anti "
    "join keys on urgent orders to keep the result non-empty): scalar "
    "aggregate broadcast into the filter + left anti join.",
    tags=("anti-join", "aggregate", "subquery"),
)
def q22(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    # Scalar subquery: exact decimal avg, cast to double on both sides.
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg(dec("c_acctbal", *PRICE)).cast("double").alias("v"))
        .collect()[0][0]  # scale-ok: 1-row scalar subquery
    )
    return (
        c.filter(F.col("c_acctbal") > avg_bal)
        .join(
            o.filter(F.col("o_orderpriority") == "1-URGENT"),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(dec("c_acctbal", *PRICE)).cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# q7 — volume shipping between two nations (dim self-join, both directions)
# ---------------------------------------------------------------------------

_Q7_N1, _Q7_N2 = "NATION_1", "NATION_2"


@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(ROUND(sum(volume), 4) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             CAST(l.l_extendedprice AS DECIMAL(25,2))
               * (1 - CAST(l.l_discount AS DECIMAL(8,6))) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = '{_Q7_N1}' AND n2.n_name = '{_Q7_N2}')
          OR (n1.n_name = '{_Q7_N2}' AND n2.n_name = '{_Q7_N1}'))
        AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1997-12-31 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    description="Trade volume between two nations in both directions by "
    "year (TPC-H Q7 shape): the nation dim joins twice under different "
    "roles (broadcast both), disjunctive pair filter after the joins.",
    tags=("join", "self-join", "aggregate"),
)
def q7(spark, sf_dir):
    s = T(spark, sf_dir, "supplier")
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            "1996-01-01 00:00:00", "1997-12-31 00:00:00"
        )
    )
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    volume = dec("l_extendedprice", *PRICE) * (1 - dec("l_discount", *RATE))
    joined = (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, F.col("o_orderkey") == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == _Q7_N1)
                & (F.col("cust_nation") == _Q7_N2)
            )
            | (
                (F.col("supp_nation") == _Q7_N2)
                & (F.col("cust_nation") == _Q7_N1)
            )
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            volume.alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 4).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q8 — national market share within a region
# ---------------------------------------------------------------------------


@register(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(ROUND(
             CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
                      ELSE CAST(0 AS DECIMAL(25,2)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE), 6) AS DOUBLE) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(25,2))
               * (1 - CAST(l.l_discount AS DECIMAL(8,6))) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'EUROPE'
        AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                              AND TIMESTAMP '1997-12-31 00:00:00'
        AND p.p_type = 'ECONOMY'
    )
    GROUP BY o_year
    """,
    description="One supplier nation's share of a region's ECONOMY-part "
    "revenue per year (TPC-H Q8 shape): 8-way join, nation joined twice "
    "under different roles, conditional share aggregate.",
    tags=("join", "aggregate", "conditional"),
    bench=True,
)
def q8(spark, sf_dir):
    p = T(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            "1996-01-01 00:00:00", "1997-12-31 00:00:00"
        )
    )
    c = T(spark, sf_dir, "customer")
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    volume = dec("l_extendedprice", *PRICE) * (1 - dec("l_discount", *RATE))
    joined = (
        F.broadcast(p)
        .join(li, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("n1_key") == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == F.col("n1_region"))
        .join(F.broadcast(n2), F.col("n2_key") == s.s_nationkey)
    )
    share_num = F.when(F.col("nation") == "NATION_3", volume).otherwise(
        F.lit(0).cast("decimal(25,2)")
    )
    return (
        joined.select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            share_num.alias("share_num"),
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum("share_num").cast("double")
                / F.sum("volume").cast("double"),
                6,
            )
            .cast("double")
            .alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# q15 — top supplier(s) by quarterly revenue (agg -> global max -> join back)
# ---------------------------------------------------------------------------


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(25,2))
                      * (1 - CAST(l_discount AS DECIMAL(8,6)))), 4) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    description="Supplier(s) with the maximum quarterly revenue (TPC-H Q15 "
    "shape): grouped revenue view, global-max scalar subquery (broadcast "
    "back as a filter), join to the supplier dim.",
    tags=("join", "aggregate", "subquery"),
)
def q15(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00"))
    )
    s = T(spark, sf_dir, "supplier")
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(
                    dec("l_extendedprice", *PRICE)
                    * (1 - dec("l_discount", *RATE))
                ),
                4,
            )
            .cast("double")
            .alias("total_revenue")
        )
    )
    max_rev = rev.agg(F.max("total_revenue")).collect()[0][0]  # scale-ok: 1-row scalar subquery
    return (
        s.join(rev, s.s_suppkey == rev.supplier_no)
        .filter(F.col("total_revenue") == max_rev)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# q17 — small-quantity-order revenue (per-part avg subquery)
# ---------------------------------------------------------------------------


@register(
    "tpch_q17_small_quantity",
    oracle="""
    SELECT CAST(ROUND(sum(CAST(l.l_extendedprice AS DECIMAL(25,2))) / 7.0, 4)
             AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#5'
      AND l.l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    """,
    description="Yearly revenue lost if small-quantity orders of one brand "
    "were not taken (TPC-H Q17 shape): the correlated per-part average "
    "decorrelates to an aggregate + join on partkey.",
    tags=("join", "aggregate", "subquery"),
)
def q17(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cut")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(
                F.sum(dec("l_extendedprice", *PRICE)).cast("double") / 7.0, 4
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# q9 — product-type profit by nation and year (adapted: no partsupp table,
# so p_retailprice stands in for supply cost)
# ---------------------------------------------------------------------------


@register(
    "tpch_q9_product_profit",
    oracle="""
    SELECT nation, o_year,
           CAST(ROUND(sum(amount), 4) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(25,2))
               * (1 - CAST(l.l_discount AS DECIMAL(8,6)))
             - CAST(p.p_retailprice AS DECIMAL(25,2))
               * CAST(l.l_quantity AS DECIMAL(12,2)) * CAST(0.1 AS DECIMAL(3,1))
               AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_type = 'PROMO'
    )
    GROUP BY nation, o_year
    """,
    description="Profit by supplier nation and year for one product type "
    "(TPC-H Q9 shape; p_retailprice*qty*0.1 stands in for the missing "
    "partsupp supply cost): 5-way join, exact decimal profit arithmetic.",
    tags=("join", "aggregate"),
)
def q9(spark, sf_dir):
    p = T(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    o = T(spark, sf_dir, "orders")
    n = T(spark, sf_dir, "nation")
    amount = dec("l_extendedprice", *PRICE) * (
        1 - dec("l_discount", *RATE)
    ) - dec("p_retailprice", *PRICE) * dec("l_quantity", *QTY) * F.lit(
        0.1
    ).cast("decimal(3,1)")
    return (
        F.broadcast(p)
        .join(li, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 4).cast("double").alias("sum_profit"))
    )
