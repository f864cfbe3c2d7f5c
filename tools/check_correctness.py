"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, sorted column
names, and values (columns sorted by name, rows sorted by all columns) —
stricter than the driver's order-insensitive value-hash, so passing here
implies passing there.

Usage:
    python tools/check_correctness.py [--sf /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def canon(rows: list[tuple], cols: list[str]):
    """Canonical form: columns sorted by name, rows sorted by repr of values."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        return repr(v)

    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def compare(name: str, spark_df, con) -> tuple[bool, str]:
    import __spark_entry__ as e

    sql = e.oracle_sql().get(name)
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    if sql is None:
        return True, f"rows-only ({len(s_rows)} rows)"
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = [tuple(r) for r in res.fetchall()]
    if sorted(s_cols) != sorted(d_cols):
        return False, f"SCHEMA spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"ROWCOUNT spark={len(s_rows)} duck={len(d_rows)}"
    _, sc = canon(s_rows, s_cols)
    _, dc = canon(d_rows, d_cols)
    if sc != dc:
        # find first mismatching row for the report
        bad = next((i for i, (a, b) in enumerate(zip(sc, dc)) if a != b), -1)
        return False, f"VALUES first mismatch at sorted-row {bad}:\n  spark={sc[bad]}\n  duck ={dc[bad]}"
    return True, f"OK ({len(s_rows)} rows)"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument(
        "--bare",
        action="store_true",
        help="Build a bare SparkSession like the driver does (Spark 4 ANSI "
        "default ON, stock confs) instead of the package session factory — "
        "queries must survive both.",
    )
    ap.add_argument("--first", type=int, default=0, help="Check only the first N registry entries (driver window).")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as e

    if args.bare:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check_correctness_bare")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from datalakes_and_data_integration_spark.session import get_spark

        spark = get_spark("check_correctness")
    con = duck_connect(args.sf)
    qs = e.queries()
    names = args.names or list(qs)
    if args.first:
        names = names[: args.first]
    failed = []
    for name in names:
        t0 = time.time()
        try:
            ok, msg = compare(name, qs[name](spark, args.sf), con)
        except Exception as ex:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(ex).__name__}: {ex}"
        dt = time.time() - t0
        print(f"{'PASS' if ok else 'FAIL'} {name:45s} {dt:6.1f}s  {msg}")
        if not ok:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    if failed:
        print("failed:", " ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
