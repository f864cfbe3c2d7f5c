"""Real-Postgres round-trip for the COPY sink (VERDICT r2 "next round" #5).

This container has no Postgres JDBC driver jar (so jdbc:postgresql is
untestable — the JDBC writer contract is pinned against embedded Derby in
test_jdbc_sink.py), but it DOES ship a full PostgreSQL 15 server. Postgres
refuses to run as root, so the fixture initdb's and runs the server as the
``nobody`` user on a unix socket under /tmp, then write_postgres_copy
loads a Spark aggregate through psql COPY and the test reads it back via
psql and compares values — a genuine wire-protocol round-trip against the
same engine family the reference targets (TimescaleDB == Postgres).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import pytest

INITDB = "/usr/local/bin/initdb"
PG_CTL = "/usr/local/bin/pg_ctl"
PSQL = shutil.which("psql")

pg_available = pytest.mark.skipif(
    not (os.path.exists(INITDB) and os.path.exists(PG_CTL) and PSQL),
    reason="postgres server binaries not installed",
)


def _su_nobody(cmd: str) -> subprocess.CompletedProcess:
    # Postgres refuses root; `nobody` can't read /root/repo, so run from /.
    return subprocess.run(
        ["su", "-s", "/bin/sh", "nobody", "-c", f"cd / && {cmd}"],
        capture_output=True,
        text=True,
    )


@pytest.fixture(scope="module")
def pg_socket_dir():
    base = tempfile.mkdtemp(prefix="pgtest-")
    os.chmod(base, 0o777)
    data = os.path.join(base, "data")
    sock = os.path.join(base, "sock")
    os.makedirs(sock)
    subprocess.run(["chown", "-R", "nobody", base], check=True)
    r = _su_nobody(f"{INITDB} -D {data} -A trust")
    if r.returncode != 0:
        pytest.skip(f"initdb failed: {r.stderr[-300:]}")
    r = _su_nobody(
        f"{PG_CTL} -D {data} -l {base}/log -o "
        f"'-c listen_addresses= -c unix_socket_directories={sock}' start"
    )
    if r.returncode != 0:
        pytest.skip(f"pg_ctl start failed: {r.stderr[-300:]}")
    try:
        yield sock
    finally:
        _su_nobody(f"{PG_CTL} -D {data} -m fast stop")
        shutil.rmtree(base, ignore_errors=True)


def _psql(sock: str, sql: str) -> str:
    r = subprocess.run(
        [
            PSQL, "--no-psqlrc", "-v", "ON_ERROR_STOP=1",
            "-h", sock, "-U", "nobody", "-d", "postgres",
            "-At", "-c", sql,
        ],
        capture_output=True,
        text=True,
        check=True,
    )
    return r.stdout.strip()


@pg_available
def test_postgres_copy_roundtrip(spark, pg_socket_dir):
    from pyspark.sql import functions as F

    from datalakes_and_data_integration_spark.sources.sinks import (
        write_postgres_copy,
    )

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    # The reference's curated shape: a small per-key aggregate mart.
    mart = (
        spark.read.parquet(os.path.join(sf, "orders.parquet"))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "total_price"
            ),
        )
        .orderBy("o_orderstatus")
    )
    n = write_postgres_copy(
        mart, pg_socket_dir, "postgres", "curated_orders", user="nobody"
    )
    assert n == mart.count() > 0

    assert _psql(
        pg_socket_dir, "SELECT count(*) FROM curated_orders"
    ) == str(n)
    # Value-level comparison, not just counts.
    got = _psql(
        pg_socket_dir,
        "SELECT o_orderstatus, n_orders, total_price "
        "FROM curated_orders ORDER BY o_orderstatus",
    ).splitlines()
    want = [
        f"{r.o_orderstatus}|{r.n_orders}|{r.total_price}"
        for r in mart.collect()
    ]
    assert got == want

    # Overwrite semantics: a second write replaces, not appends.
    write_postgres_copy(
        mart, pg_socket_dir, "postgres", "curated_orders", user="nobody"
    )
    assert _psql(
        pg_socket_dir, "SELECT count(*) FROM curated_orders"
    ) == str(n)


@pg_available
def test_postgres_copy_append_and_type_guard(spark, pg_socket_dir):
    from pyspark.sql import functions as F

    from datalakes_and_data_integration_spark.sources.sinks import (
        write_postgres_copy,
    )

    df = spark.range(3).select(
        F.col("id").alias("k"), (F.col("id") * 2.5).alias("v")
    )
    write_postgres_copy(df, pg_socket_dir, "postgres", "t_app", user="nobody")
    write_postgres_copy(
        df, pg_socket_dir, "postgres", "t_app", user="nobody", mode="append"
    )
    assert _psql(pg_socket_dir, "SELECT count(*) FROM t_app") == "6"

    arr = spark.range(1).select(F.array(F.lit(1)).alias("a"))
    with pytest.raises(ValueError, match="unsupported column type"):
        write_postgres_copy(
            arr, pg_socket_dir, "postgres", "t_arr", user="nobody"
        )
