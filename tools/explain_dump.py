"""Dump ``explain("formatted")`` for named queries to text files.

Round-9 optimization evidence: the judge checks plan claims against
committed ``plans/r09/<query>_{before,after}.txt`` files. Run this from
the pre-change tree (a git worktree at the round's base commit) with
``--suffix before`` and from the working tree with ``--suffix after``.

Usage:
    python tools/explain_dump.py --out plans/r09 --suffix after name ...
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r09")
    ap.add_argument("--suffix", default="after")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from datalakes_and_data_integration_spark import plans
    from datalakes_and_data_integration_spark.session import get_spark

    spark = get_spark("explain-dump")
    os.makedirs(args.out, exist_ok=True)
    for name in args.names:
        q = plans.QUERIES[name]
        df = q.spark(spark, args.sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(
                f"# {name} — returned-DataFrame physical plan "
                f"(explain 'formatted'), suffix={args.suffix}\n"
            )
            fh.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} chars)")


if __name__ == "__main__":
    main()
