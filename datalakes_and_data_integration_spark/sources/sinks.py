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
    sort_within: Sequence = (),
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet write; optional within-partition sort to mirror
    Cassandra's clustering order (reference preprocess_to_staging.py:107-108
    — `PRIMARY KEY (code_site, date_de_debut)` clustered ASC), which gives
    time-locality for the window stages downstream.

    ``sort_within`` accepts names or Column sort expressions. When the
    upstream plan already emits the requested order (e.g. a window stage
    sorted by the same keys), pass sort expressions with the SAME null
    ordering — Spark's RemoveRedundantSorts can then elide the SortExec
    entirely, instead of re-sorting the full wide table before the write
    (a default-direction mismatch like nulls_first vs the window's
    nulls_last forces a redundant O(n log n) pass)."""
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


def write_postgres_copy(
    df: DataFrame,
    socket_dir: str,
    dbname: str,
    table: str,
    user: str = "postgres",
    mode: str = "overwrite",
    psql_bin: str = "psql",
) -> int:
    """Bulk-load a mart-sized DataFrame into a real Postgres-protocol
    server via ``COPY FROM STDIN`` through ``psql`` — the reference's
    curated-warehouse write (`/root/reference/src/process_to_curated.py:
    189-199`, pandas ``to_sql(if_exists='replace')`` to TimescaleDB)
    re-expressed as the COPY bulk protocol (the fast path every Postgres
    loader converges on; row INSERTs are ~10-50x slower).

    Why not ``write.jdbc('jdbc:postgresql:...')``: this container ships no
    Postgres JDBC driver jar and no network to fetch one, so the
    jdbc:postgresql route is untestable here; the JDBC writer contract is
    pinned against embedded Derby instead (tests/test_jdbc_sink.py). This
    sink covers the other half — a REAL Postgres server speaking the real
    wire protocol (tests/test_postgres_sink.py starts one on a unix
    socket). Connection is socket-based: ``psql -h <socket_dir>``.

    Scale shape: the curated mart the reference ships to Postgres is an
    AGGREGATE (thousands of rows, not the lake), so a single-stream COPY
    through the driver is the right size. For fact-scale loads, run the
    same COPY per partition from executors (``df.foreachPartition`` with a
    client lib, or per-partition CSV + parallel ``psql``) against a
    partitioned target table.

    Returns the number of rows loaded. ``mode='overwrite'`` recreates the
    table (the reference's ``if_exists='replace'``); ``'append'`` requires
    it to exist.
    """
    import io
    import subprocess

    def q(ident: str) -> str:
        return '"' + ident.replace('"', '""') + '"'

    _PG_TYPES = {
        "long": "bigint",
        "bigint": "bigint",
        "int": "integer",
        "integer": "integer",
        "smallint": "smallint",
        "tinyint": "smallint",
        "double": "double precision",
        "float": "real",
        "string": "text",
        "boolean": "boolean",
        "date": "date",
        "timestamp": "timestamp",
        "timestamp_ntz": "timestamp",
    }
    cols = []
    for f in df.schema.fields:
        t = f.dataType.typeName()
        if t == "decimal":
            pg = f.dataType.simpleString()  # decimal(p,s) is valid in PG
        elif t in _PG_TYPES:
            pg = _PG_TYPES[t]
        else:
            raise ValueError(
                f"write_postgres_copy: unsupported column type {t!r} for "
                f"{f.name!r} (flatten arrays/structs before the mart write)"
            )
        cols.append(f"{q(f.name)} {pg}")

    pdf = df.toPandas()  # scale-ok: mart-sized aggregate (see docstring)
    buf = io.StringIO()
    pdf.to_csv(buf, index=False, header=False)

    ddl = ""
    if mode == "overwrite":
        ddl = (
            f"DROP TABLE IF EXISTS {q(table)}; "
            f"CREATE TABLE {q(table)} ({', '.join(cols)}); "
        )
    sql = (
        f"{ddl}COPY {q(table)} FROM STDIN WITH (FORMAT csv, NULL '')"
    )
    subprocess.run(
        [
            psql_bin,
            "--no-psqlrc",
            "-v",
            "ON_ERROR_STOP=1",
            "-h",
            socket_dir,
            "-U",
            user,
            "-d",
            dbname,
            "-c",
            sql,
        ],
        input=buf.getvalue().encode(),
        check=True,
        capture_output=True,
    )
    return len(pdf)


def compact_parquet(
    spark,
    table_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within: Sequence[str] = (),
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files (the OPTIMIZE half of Delta's
    OPTIMIZE/ZORDER; pair with operators.layout.zorder_layout for the
    clustering half).

    Small files are the silent killer of 100 TB scans — every file costs a
    task, a footer read, and an object-store request; streaming and
    incremental writers produce them constantly. Returns the new file
    count. Crash-safe via the upsert sinks' tombstone swap.
    """
    import math
    import os
    import shutil
    import tempfile

    from datalakes_and_data_integration_spark.operators.upsert import swap_dir

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(table_dir)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(table_dir)
    out = df.repartition(n_files)
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    staging = tempfile.mkdtemp(
        prefix=".compact_", dir=os.path.dirname(table_dir) or "."
    )
    tmp = os.path.join(staging, "data")
    out.write.mode("overwrite").parquet(tmp)
    swap_dir(tmp, table_dir)
    shutil.rmtree(staging, ignore_errors=True)
    return len(
        [f for f in os.listdir(table_dir) if f.endswith(".parquet")]
    )


def plan_compaction(
    sizes: dict[str, int],
    target_file_bytes: int = 128 * 1024 * 1024,
    small_ratio: float = 0.5,
) -> list[list[str]]:
    """Select and batch undersized files for selective compaction.

    ``compact_parquet`` rewrites the whole table — right after a bulk
    load, wrong as maintenance: at 100 TB you only want to touch the
    files that are actually small (streaming commits, incremental
    upserts), not rewrite healthy 128 MB files to fix a thousand 1 MB
    ones. This is the planner half: files under ``small_ratio * target``
    are packed first-fit-decreasing into batches of ~``target`` bytes;
    every returned batch merges to one right-sized file and each batch is
    an independent unit of work (parallelizable, resumable).

    Pure function over a {path: bytes} listing — works the same against a
    local directory walk or an object-store inventory. Files >= the small
    threshold are never touched. A single undersized file still forms a
    batch only when there is something to merge it with — a lone small
    file is left in place (rewriting it buys nothing).
    """
    small = sorted(
        (
            (p, sz)
            for p, sz in sizes.items()
            if sz < small_ratio * target_file_bytes
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )
    paths_of: list[list[str]] = []
    size_of: list[int] = []
    for path, sz in small:
        for i, used in enumerate(size_of):
            if used + sz <= target_file_bytes:
                paths_of[i].append(path)
                size_of[i] = used + sz
                break
        else:
            paths_of.append([path])
            size_of.append(sz)
    return [paths for paths in paths_of if len(paths) > 1]


def compact_selected(spark, table_dir: str, batch: list[str]) -> str:
    """Merge one planned batch into a single right-sized file in place.

    Write-then-delete ordering: the merged file lands under a unique name
    first, the originals are removed after — a crash in between leaves
    duplicate rows (visible, recoverable) rather than lost rows. True
    isolation for concurrent readers needs a table format's snapshot
    commit (Delta/Iceberg); this is the raw-parquet-directory best case,
    same trade as the reference's raw zone.
    """
    import os
    import shutil
    import uuid

    staging = os.path.join(table_dir, f".compact-{uuid.uuid4().hex}")
    spark.read.parquet(*batch).coalesce(1).write.mode("overwrite").parquet(
        staging
    )
    part = next(
        f for f in os.listdir(staging) if f.endswith(".parquet")
    )
    final = os.path.join(table_dir, f"compacted-{uuid.uuid4().hex}.parquet")
    os.replace(os.path.join(staging, part), final)
    shutil.rmtree(staging)
    for p in batch:
        os.remove(p)
    return final
