"""Interchange formats beyond parquet/CSV: JSON-lines and ORC.

The reference's landing zone is CSV and its lake is parquet-shaped
(SURVEY.md §2.1); real migrations also carry JSONL exports (APIs,
event dumps) and ORC (Hive-era warehouses). Both are first-class Spark
sources — these helpers pin the options that make them deterministic
round-trips, and the tests prove schema + value fidelity against the
parquet-loaded truth.

Scale notes: JSONL with an explicit schema avoids the schema-inference
pre-scan (a full extra read at 100 TB); ORC gets the same predicate
pushdown / column pruning as parquet (verified in the test via the
explain output).

Avro: Spark treats it as an external module (spark-avro jar), which this
container does not ship and cannot fetch — ``format("avro")`` raises
AnalysisException here (probed round 3). On a cluster with the jar, the
same helper pattern applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_jsonl(df: DataFrame, path: str) -> None:
    """Deterministic JSONL export: ISO-8601 timestamps, no compression
    (downstream tools expect plain lines).

    TIMESTAMP and TIMESTAMP_NTZ are formatted by *different* options
    (`timestampFormat` vs `timestampNTZFormat`); both default to
    millisecond precision, which silently truncates microseconds —
    the lake's event timestamps are microsecond-resolution, so both
    must be pinned to SSSSSS for a lossless round-trip.
    """
    (
        df.write.mode("overwrite")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .json(path)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """Schema-explicit JSONL read — never schema inference, which costs
    a full pre-scan and can narrow types on partial data."""
    return (
        spark.read.schema(schema)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .option("mode", "FAILFAST")
        .json(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    """ORC with zlib — the Hive-warehouse interchange default."""
    df.write.mode("overwrite").option("compression", "zlib").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
