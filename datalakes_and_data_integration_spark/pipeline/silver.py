"""Silver zone: normalize -> type -> filter -> dedup (reference staging).

Reference behaviors reproduced (SURVEY.md §2.2/§2.4):
- P1 name normalization (headers arrive normalized from the bronze schema;
  the function is still applied for schema drift).
- P2 typed casts, null-on-error: two-format timestamp parse
  (preprocess_to_staging.py:43-53), float parse (:56-61), empty-string ->
  null (:39-40).
- P3 empty-row filter (:195).
- A1 full-row distinct per pollutant (:171,193-197).
- A2 PK dedup on (code_site, date_de_debut) — the reference's LWT
  first-writer-wins (:140) made deterministic with an explicit
  (ingest_date, source_order) tiebreak (SURVEY.md §7.4).

One shuffle per dedup; both dedup stages key on the same columns, so Spark
reuses the exchange. Output partitioned by pollutant (the per-pollutant
Cassandra tables) and sorted within partitions by (code_site,
date_de_debut) — the clustering order (:107-108).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakes_and_data_integration_spark.operators import (
    dedup_full_row,
    dedup_keep_first,
    normalize_columns,
)
from datalakes_and_data_integration_spark.sources.sinks import write_partitioned

TIMESTAMP_COLS = ["date_de_debut", "date_de_fin"]
FLOAT_COLS = ["valeur", "valeur_brute", "taux_de_saisie"]
PK = ["code_site", "date_de_debut"]


def typed_cast(df: DataFrame) -> DataFrame:
    """Apply the silver type surface (SURVEY.md §1.2) with null-on-error."""
    out = df
    for c in df.columns:
        if c in TIMESTAMP_COLS:
            out = out.withColumn(
                c,
                F.coalesce(
                    F.try_to_timestamp(F.col(c), F.lit("yyyy/MM/dd HH:mm:ss")),
                    F.try_to_timestamp(F.col(c), F.lit("yyyy/MM/dd")),
                ),
            )
        elif c in FLOAT_COLS:
            out = out.withColumn(
                c, F.nullif(F.col(c), F.lit("")).cast("double")
            )
        elif dict(df.dtypes).get(c) == "string":
            out = out.withColumn(c, F.nullif(F.col(c), F.lit("")))
    return out


def drop_empty_rows(df: DataFrame, data_cols: list[str]) -> DataFrame:
    """Drop rows whose every data cell is blank (reference P3)."""
    any_filled = None
    for c in data_cols:
        cond = F.nullif(F.trim(F.col(c).cast("string")), F.lit("")).isNotNull()
        any_filled = cond if any_filled is None else (any_filled | cond)
    return df.filter(any_filled)


def build_silver(
    spark: SparkSession, bronze_dir: str, silver_dir: str
) -> DataFrame:
    from datalakes_and_data_integration_spark.sources.csv_landing import (
        RAW_SCHEMA,
    )
    from pyspark.sql import types as T_

    bronze_schema = T_.StructType(
        list(RAW_SCHEMA.fields)
        + [
            T_.StructField("pollutant_code", T_.StringType(), True),
            T_.StructField("ingest_date", T_.StringType(), True),
        ]
    )
    bronze = spark.read.schema(bronze_schema).parquet(bronze_dir)
    df = normalize_columns(bronze)
    data_cols = [c for c in df.columns if c not in ("pollutant_code", "ingest_date")]
    df = drop_empty_rows(df, data_cols)
    df = typed_cast(df)
    df = dedup_full_row(df)
    # Deterministic first-writer-wins: the reference keeps whichever row S3
    # happened to list first (unspecified order, SURVEY.md §7.4); we keep the
    # lexicographically smallest row — earliest ingest file first, then every
    # remaining column as tiebreak, which IS a total order.
    tiebreak = [F.col("ingest_date").asc_nulls_last()] + [
        F.col(c).asc_nulls_last()
        for c in sorted(df.columns)
        if c != "ingest_date"
    ]
    df = dedup_keep_first(df, keys=["pollutant_code", *PK], order_by=tiebreak)
    write_partitioned(
        df,
        silver_dir,
        partition_by=["pollutant_code"],
        sort_within=PK,
    )
    return spark.read.schema(df.schema).parquet(silver_dir)


def build_silver_incremental(
    spark: SparkSession,
    bronze_dir: str,
    silver_dir: str,
    ingest_dates: list[str] | None = None,
) -> DataFrame:
    """Incremental silver: process only the given bronze ``ingest_date``
    partitions and MERGE them into the existing silver table.

    This is the reference's actual operating mode (SURVEY.md §2.8): every
    day re-fetch the last 3 days, re-process the overlap, and let
    first-writer-wins drop rows whose PK already landed — an *updated*
    value for an existing (code_site, date_de_debut) is dropped, not
    upserted, exactly like the Cassandra LWT. Here the overlap never
    leaves the bronze scan (partition pruning on ingest_date) and the
    MERGE is operators.upsert.merge_new_only.
    """
    from datalakes_and_data_integration_spark.operators.upsert import (
        upsert_parquet,
    )

    bronze = spark.read.parquet(bronze_dir)
    if ingest_dates:
        bronze = bronze.filter(F.col("ingest_date").isin(ingest_dates))
    df = normalize_columns(bronze)
    data_cols = [c for c in df.columns if c not in ("pollutant_code", "ingest_date")]
    df = drop_empty_rows(df, data_cols)
    df = typed_cast(df)
    df = dedup_full_row(df)
    tiebreak = [F.col("ingest_date").asc_nulls_last()] + [
        F.col(c).asc_nulls_last()
        for c in sorted(df.columns)
        if c != "ingest_date"
    ]
    return upsert_parquet(
        spark,
        silver_dir,
        df,
        keys=["pollutant_code", *PK],
        order_by=tiebreak,
    )
