"""Emit a CORRECTNESS_r*.json-shaped artifact for a named query subset.

Same comparison as tools/check_correctness.py (the strict local gate) but
dumps the driver's row format so in-session advance evidence is committable
(ADVICE r7: the registry's session-6 newcomer note should be reproducible
from the repo, not from an uncommitted terminal scrollback).

Usage: python tools/emit_correctness_json.py OUT.json [--sf DIR] name...
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_correctness import compare_detail, duck_connect  # noqa: E402


def main() -> None:
    out_path = sys.argv[1]
    argv = sys.argv[2:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    if argv and argv[0] == "--sf":
        sf = argv[1]
        argv = argv[2:]
    names = argv

    import __spark_entry__ as e

    from datalakes_and_data_integration_spark.session import get_spark

    spark = get_spark("emit_correctness")
    con = duck_connect(sf)
    qs = e.queries()
    rows: dict[str, dict] = {}
    for name in names:
        row = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        ok = False
        try:
            df = qs[name](spark, sf)
            # per-check outcomes as ACTUALLY measured (ADVICE r8: no
            # fabricated oracle_rows, no mirrored booleans — a rows-only
            # query records None for the oracle-side checks)
            ok, msg, detail = compare_detail(name, df, con)
            row.update(detail)
            row["err"] = None if ok else msg
        except Exception as ex:  # noqa: BLE001
            row["err"] = f"{type(ex).__name__}: {ex}"
        rows[name] = row
        print(("PASS" if ok else "FAIL"), name, flush=True)
    with open(out_path, "w") as fh:
        json.dump(rows, fh, indent=2)
        fh.write("\n")
    bad = [n for n, r in rows.items() if r["err"] is not None]
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
