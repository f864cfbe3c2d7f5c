"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, sorted column
names, arrow type families, and values (columns sorted by name, rows sorted
by all columns).

The DuckDB result is routed through Arrow (``fetch_arrow_table``), exactly
like the driver's hasher — NOT ``fetchall()``, whose Python conversion hides
oracle typing bugs (DuckDB integer ``sum()`` returns HUGEINT, which arrow
renders as decimal128(38,0) but fetchall flattens to int; the driver hashes
the arrow form, so an uncast sum hash-mismatches there while passing a
fetchall-based gate — the exact failure mode of the 4 red rows in
CORRECTNESS_r02). A per-column type-family check (int/float/decimal/...)
fails fast with an ``ORACLE-TYPE`` message before the value diff.

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


def _arrow_family(t) -> str:
    """Coarse arrow type family — mirrors what survives the driver's hash.

    Timestamp unit (us/ns) and integer width are normalized away (the driver
    tolerates those — r2 evidence: every timestamp query passed), but
    decimal-vs-int and decimal-vs-float are NOT (the r2 failure mode).
    """
    import pyarrow.types as pt

    if pt.is_integer(t):
        return "int"
    if pt.is_floating(t):
        return "float"
    if pt.is_decimal(t):
        return "decimal"
    if pt.is_boolean(t):
        return "bool"
    if pt.is_timestamp(t):
        return "timestamp"
    if pt.is_date(t):
        return "date"
    if pt.is_string(t) or pt.is_large_string(t):
        return "string"
    if pt.is_binary(t) or pt.is_large_binary(t):
        return "binary"
    if pt.is_list(t) or pt.is_large_list(t) or pt.is_fixed_size_list(t):
        return "list"
    if pt.is_map(t):
        return "map"
    if pt.is_struct(t):
        return "struct"
    return str(t)


def _spark_family(dt) -> str:
    name = dt.typeName()
    return {
        "byte": "int", "short": "int", "integer": "int", "long": "int",
        "float": "float", "double": "float",
        "decimal": "decimal",
        "boolean": "bool",
        "timestamp": "timestamp", "timestamp_ntz": "timestamp",
        "date": "date",
        "string": "string", "varchar": "string", "char": "string",
        "binary": "binary",
        "array": "list",
        "map": "map",
        "struct": "struct",
    }.get(name, name)


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


def compare_detail(name: str, spark_df, con) -> tuple[bool, str, dict]:
    """compare() plus the per-check outcomes that were ACTUALLY measured
    (ADVICE r8: emit_correctness_json used to fabricate oracle_rows from
    the Spark count and mirror one boolean into all three checks). The
    detail dict reports None for checks never reached — a schema
    mismatch leaves rows/hash None, a rows-only query leaves the oracle
    side None — so a committed artifact can't overstate the evidence."""
    import __spark_entry__ as e

    sql = e.oracle_sql().get(name)
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    detail = {
        "spark_rows": len(s_rows),
        "oracle_rows": None,
        "rows_match": None,
        "schema_match": None,
        "hash_match": None,
    }
    if sql is None:
        return True, f"rows-only ({len(s_rows)} rows)", detail
    # Arrow path, like the driver's hasher — fetchall() would hide
    # HUGEINT-vs-BIGINT oracle typing bugs (see module docstring).
    tbl = con.execute(sql).fetch_arrow_table()
    d_cols = list(tbl.column_names)
    d_rows = [tuple(d[c] for c in d_cols) for d in tbl.to_pylist()]
    detail["oracle_rows"] = len(d_rows)
    if sorted(s_cols) != sorted(d_cols):
        detail["schema_match"] = False
        return (
            False,
            f"SCHEMA spark={sorted(s_cols)} duck={sorted(d_cols)}",
            detail,
        )
    s_fam = {f.name: _spark_family(f.dataType) for f in spark_df.schema.fields}
    d_fam = {fld.name: _arrow_family(fld.type) for fld in tbl.schema}
    bad_types = {
        c: (s_fam[c], d_fam[c]) for c in s_fam if s_fam[c] != d_fam[c]
    }
    if bad_types:
        detail["schema_match"] = False
        return False, f"ORACLE-TYPE family mismatch {bad_types}", detail
    detail["schema_match"] = True
    detail["rows_match"] = len(s_rows) == len(d_rows)
    if not detail["rows_match"]:
        return (
            False,
            f"ROWCOUNT spark={len(s_rows)} duck={len(d_rows)}",
            detail,
        )
    _, sc = canon(s_rows, s_cols)
    _, dc = canon(d_rows, d_cols)
    detail["hash_match"] = sc == dc
    if not detail["hash_match"]:
        # find first mismatching row for the report
        bad = next((i for i, (a, b) in enumerate(zip(sc, dc)) if a != b), -1)
        return (
            False,
            f"VALUES first mismatch at sorted-row {bad}:\n  spark={sc[bad]}\n  duck ={dc[bad]}",
            detail,
        )
    return True, f"OK ({len(s_rows)} rows)", detail


def compare(name: str, spark_df, con) -> tuple[bool, str]:
    ok, msg, _ = compare_detail(name, spark_df, con)
    return ok, msg


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
