"""S18 warehouse sink, executed for real.

The reference's only warehouse sink replaces a Postgres/TimescaleDB table
wholesale each run (process_to_curated.py:189-199, if_exists='replace').
No database server ships in this container, but Spark bundles Apache
Derby (embedded, in-process JDBC) — so the sink contract (url / table /
mode=overwrite / batchsize) is exercised end-to-end: write, read back,
overwrite again, read back again.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from datalakes_and_data_integration_spark.sources.sinks import write_jdbc_overwrite

DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture()
def derby_url(spark, tmp_path):
    # Keep derby.log out of the repo root; must be set before the driver
    # class first loads in the JVM.
    spark._jvm.java.lang.System.setProperty("derby.system.home", str(tmp_path))
    return f"jdbc:derby:{tmp_path}/warehouse_db;create=true"


def test_jdbc_overwrite_roundtrip_and_replace(spark, derby_url):
    df1 = spark.range(1000).select(
        F.col("id").alias("site_id"),
        (F.col("id") * 2.5).alias("value"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
    )
    write_jdbc_overwrite(df1, derby_url, "curated_metrics", DERBY_PROPS, batchsize=256)

    back1 = spark.read.jdbc(derby_url, "curated_metrics", properties=DERBY_PROPS)
    assert back1.count() == 1000
    assert set(back1.columns) == {"site_id", "value", "ts"}
    row = back1.filter(F.col("site_id") == 7).collect()[0]
    assert row.value == 17.5

    # mode=overwrite must REPLACE the table (the reference's
    # if_exists='replace'), not append to it.
    df2 = spark.range(10).select(
        F.col("id").alias("site_id"),
        F.lit(-1.0).alias("value"),
        F.timestamp_micros(F.lit(0)).alias("ts"),
    )
    write_jdbc_overwrite(df2, derby_url, "curated_metrics", DERBY_PROPS)
    back2 = spark.read.jdbc(derby_url, "curated_metrics", properties=DERBY_PROPS)
    assert back2.count() == 10
    assert back2.agg(F.max("value")).collect()[0][0] == -1.0


def test_jdbc_writer_options_contract(spark, monkeypatch):
    """The options the sink hands to DataFrameWriter.jdbc are the contract
    the real warehouse depends on — pin them without needing a server."""
    captured = {}

    def fake_jdbc(self, url, table, mode=None, properties=None):
        captured.update(url=url, table=table, mode=mode, properties=properties)

    from pyspark.sql import DataFrameWriter

    monkeypatch.setattr(DataFrameWriter, "jdbc", fake_jdbc)
    df = spark.range(1)
    write_jdbc_overwrite(
        df, "jdbc:postgresql://wh:5432/lake", "public.curated",
        {"user": "etl"}, batchsize=5000,
    )
    assert captured["url"] == "jdbc:postgresql://wh:5432/lake"
    assert captured["table"] == "public.curated"
    assert captured["mode"] == "overwrite"
    assert captured["properties"]["batchsize"] == "5000"
    assert captured["properties"]["user"] == "etl"
