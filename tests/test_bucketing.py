"""Bucketed-table join test: pre-bucketing both sides on the join key makes
the join shuffle-free — the 100 TB co-location strategy the scale notes
reference (SURVEY.md §7.2.5)."""

from __future__ import annotations

import re

import pytest


@pytest.fixture()
def bucketed_tables(spark):
    # Uses the session's default warehouse dir (spark-warehouse/, gitignored)
    # — spark.sql.warehouse.dir is a static conf and can't move per-test.
    orders = spark.createDataFrame(
        [(i % 50, i, float(i)) for i in range(2000)],
        ["user_id", "order_id", "amount"],
    )
    users = spark.createDataFrame(
        [(u, f"user-{u}") for u in range(50)], ["user_id", "name"]
    )
    orders.write.bucketBy(8, "user_id").sortBy("user_id").mode(
        "overwrite"
    ).saveAsTable("b_orders")
    users.write.bucketBy(8, "user_id").mode("overwrite").saveAsTable("b_users")
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_users")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    # Force a non-broadcast join so the exchange (or its absence) is real.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_users"), "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert not re.search(r"Exchange hashpartitioning", plan), plan
        assert joined.count() == 2000
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_aggregation_is_shuffle_free(spark, bucketed_tables):
    from pyspark.sql import functions as F

    agg = spark.table("b_orders").groupBy("user_id").agg(F.sum("amount"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"Exchange hashpartitioning", plan), plan
    assert agg.count() == 50
