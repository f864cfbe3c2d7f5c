"""Regenerate QUERIES.md from the registry (run after adding queries).

Usage: python tools/gen_queries_md.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADER = """# QUERIES — the declared inventory (generated from plans.QUERIES)

Every entry is exposed through `__spark_entry__.queries()`; `oracle` means
the driver hash-compares it against the given DuckDB SQL at sf0.01,
`rows-only` marks ops that are not SQL-expressible (iterative algorithms,
byte-level arithmetic, engine-specific sketches). `bench` queries are
timed by `bench.py` at sf0.1.

| query | check | bench | tags | description |
|---|---|---|---|---|
"""


def main() -> int:
    from datalakes_and_data_integration_spark import plans

    out = [HEADER]
    for name, q in sorted(plans.QUERIES.items()):
        check = "oracle" if q.oracle else "rows-only"
        bench = "yes" if q.bench else ""
        desc = " ".join(q.description.split())
        out.append(
            f"| `{name}` | {check} | {bench} | {', '.join(q.tags)} | {desc} |\n"
        )
    n_oracle = sum(1 for q in plans.QUERIES.values() if q.oracle)
    out.append(
        f"\n{len(plans.QUERIES)} queries; {n_oracle} oracle-checked, "
        f"{len(plans.QUERIES) - n_oracle} rows-only.\n"
    )
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "QUERIES.md")
    with open(path, "w") as f:
        f.writelines(out)
    print(f"wrote {path}: {len(plans.QUERIES)} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
