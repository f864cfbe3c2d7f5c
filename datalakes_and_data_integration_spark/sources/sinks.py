"""Warehouse sinks (reference S18 + storage-layout knobs).

The reference replaces a single Postgres/TimescaleDB table wholesale each
run (`/root/reference/src/process_to_curated.py:189-199`,
``if_exists='replace'``). Spark-side: ``write.jdbc(mode='overwrite')`` when
a JDBC URL is configured, else partitioned parquet (the lakehouse-native
sink; the container has no database server).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    sort_within: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet write; optional within-partition sort to mirror
    Cassandra's clustering order (reference preprocess_to_staging.py:107-108
    — `PRIMARY KEY (code_site, date_de_debut)` clustered ASC), which gives
    time-locality for the window stages downstream."""
    if sort_within:
        df = df.sortWithinPartitions(*sort_within)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_jdbc_overwrite(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    batchsize: int = 10_000,
) -> None:
    """JDBC overwrite sink (S18). ``batchsize`` replaces the reference's
    hand-rolled batch-of-100 inserts (faster_preprocess_to_staging.py:
    135-167) with the driver-native batching."""
    props = {"batchsize": str(batchsize)}
    if properties:
        props.update(properties)
    df.write.jdbc(url, table, mode="overwrite", properties=props)
