"""Streaming -> MERGE sink: foreachBatch + keyed upsert gives exactly-once
table maintenance from an at-least-once stream (the cross-batch idempotency
story of SURVEY.md §2.8, wired end-to-end)."""

from __future__ import annotations

import tempfile


def test_foreach_batch_upsert_is_idempotent(spark):
    from datalakes_and_data_integration_spark.operators.upsert import (
        upsert_parquet,
    )

    src = tempfile.mkdtemp(prefix="fbu_src_")
    table = tempfile.mkdtemp(prefix="fbu_tbl_") + "/t"

    # Batch 1: keys 1-3. Batch 2 REDELIVERS key 3 (changed payload — must be
    # dropped, first-writer-wins) and adds keys 4-5.
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    ).coalesce(1).write.parquet(f"{src}/b1.parquet")
    spark.createDataFrame(
        [(3, "CLOBBER"), (4, "d"), (5, "e")], ["k", "v"]
    ).coalesce(1).write.parquet(f"{src}/b2.parquet")

    stream = (
        spark.readStream.schema("k bigint, v string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", True)
        .parquet(src)
    )

    def sink(batch_df, batch_id):
        upsert_parquet(
            batch_df.sparkSession, table, batch_df, keys=["k"]
        )

    ckpt = tempfile.mkdtemp(prefix="fbu_ckpt_")
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = {(r.k, r.v) for r in spark.read.parquet(table).collect()}
    assert rows == {(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")}


def test_continuous_aggregate_maintenance(spark):
    """Streaming hourly rollup maintained incrementally: two micro-batches
    contribute partial sums for the SAME hour and they ADD (the TimescaleDB
    continuous-aggregate rule), while distinct hours coexist."""
    import datetime as dt

    from pyspark.sql import functions as F

    from datalakes_and_data_integration_spark.operators.upsert import (
        upsert_parquet_additive,
    )

    src = tempfile.mkdtemp(prefix="cagg_src_")
    table = tempfile.mkdtemp(prefix="cagg_tbl_") + "/t"
    h0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    h1 = dt.datetime(2024, 1, 1, 11, 0, 0)
    spark.createDataFrame(
        [(h0, 1.0), (h0, 2.0)], ["ts", "value"]
    ).coalesce(1).write.parquet(f"{src}/b1.parquet")
    spark.createDataFrame(
        [(h0, 4.0), (h1, 10.0)], ["ts", "value"]
    ).coalesce(1).write.parquet(f"{src}/b2.parquet")

    stream = (
        spark.readStream.schema("ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", True)
        .parquet(src)
    )

    def sink(batch_df, batch_id):
        partial = batch_df.groupBy(
            F.date_trunc("hour", "ts").alias("hour")
        ).agg(F.sum("value").alias("total"), F.count("*").alias("n"))
        upsert_parquet_additive(
            batch_df.sparkSession, table, partial,
            keys=["hour"], sums=["total", "n"],
        )

    ckpt = tempfile.mkdtemp(prefix="cagg_ckpt_")
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r.hour: (r.total, r.n) for r in spark.read.parquet(table).collect()}
    assert rows == {h0: (7.0, 3), h1: (10.0, 1)}
