"""Command-line orchestration — the reference's Airflow DAG shape
(`/root/reference/dags/datalake_pipeline.py:54`: unpack >> preprocess >>
process) as plain entry points.

    python -m datalakes_and_data_integration_spark run-pipeline \
        --landing /data/landing --work /data/zones
    python -m datalakes_and_data_integration_spark serve-api \
        --landing /data/landing --work /data/zones --port 8080
    python -m datalakes_and_data_integration_spark fetch \
        --base-url https://api.example --landing /data/landing
    python -m datalakes_and_data_integration_spark query tpch_q1_pricing_summary \
        --sf-dir /root/testdata/sf0.01

Each stage is also importable individually (pipeline.bronze/silver/gold) so
an external scheduler (Airflow PythonOperator, cron, a CI job) can own the
DAG; the reference's two DAG variants collapse to one — Spark IS the fast
variant (SURVEY.md §2.10).
"""

from __future__ import annotations

import argparse
import sys


def _spark():
    from datalakes_and_data_integration_spark.session import get_spark

    return get_spark("datalakes_and_data_integration_spark.cli")


def cmd_run_pipeline(args) -> int:
    from datalakes_and_data_integration_spark.pipeline.gold import run_pipeline

    gold = run_pipeline(_spark(), args.landing, args.work)
    print(f"gold rows={gold.count()} cols={len(gold.columns)} -> {args.work}/gold")
    return 0


def cmd_serve_api(args) -> int:
    from datalakes_and_data_integration_spark.sources.ingest_api import serve

    def trigger(variant: str) -> None:
        from datalakes_and_data_integration_spark.pipeline.gold import (
            run_pipeline,
        )

        run_pipeline(_spark(), args.landing, args.work)

    server = serve(args.landing, trigger=trigger, port=args.port)
    print(f"ingest API on http://127.0.0.1:{server.server_address[1]}")
    try:
        import threading

        threading.Event().wait()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


def cmd_fetch(args) -> int:
    from datalakes_and_data_integration_spark.sources.catalog import (
        ACTIVE_POLLUTANTS,
    )
    from datalakes_and_data_integration_spark.sources.remote_fetch import (
        fetch_window_to_landing,
    )

    stored = fetch_window_to_landing(
        args.base_url,
        args.api_key,
        args.landing,
        [p["code"] for p in ACTIVE_POLLUTANTS],
        n_days=args.days,
    )
    print(f"fetched {len(stored)} files")
    return 0


def cmd_list(args) -> int:
    from datalakes_and_data_integration_spark import plans

    for name, q in sorted(plans.QUERIES.items()):
        flags = []
        if q.bench:
            flags.append("bench")
        flags.append("oracle" if q.oracle else "rows-only")
        print(f"{name:38s} [{', '.join(flags)}] {', '.join(q.tags)}")
    print(f"\n{len(plans.QUERIES)} queries")
    return 0


def cmd_sql(args) -> int:
    from datalakes_and_data_integration_spark.session import load_tables

    spark = _spark()
    load_tables(spark, args.sf_dir)
    spark.sql(args.statement).show(args.rows, truncate=False)
    return 0


def cmd_query(args) -> int:
    from datalakes_and_data_integration_spark import plans

    if args.name not in plans.QUERIES:
        print(f"unknown query {args.name!r}; known: {sorted(plans.QUERIES)}")
        return 2
    df = plans.QUERIES[args.name].spark(_spark(), args.sf_dir)
    df.show(args.rows, truncate=False)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="datalakes_and_data_integration_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    rp = sub.add_parser("run-pipeline", help="bronze -> silver -> gold")
    rp.add_argument("--landing", required=True)
    rp.add_argument("--work", required=True)
    rp.set_defaults(fn=cmd_run_pipeline)

    sv = sub.add_parser("serve-api", help="push-ingestion HTTP gateway")
    sv.add_argument("--landing", required=True)
    sv.add_argument("--work", required=True)
    sv.add_argument("--port", type=int, default=8080)
    sv.set_defaults(fn=cmd_serve_api)

    ft = sub.add_parser("fetch", help="pull last-N-days from the REST API")
    ft.add_argument("--base-url", required=True)
    ft.add_argument("--api-key", default=None)
    ft.add_argument("--landing", required=True)
    ft.add_argument("--days", type=int, default=3)
    ft.set_defaults(fn=cmd_fetch)

    ls = sub.add_parser("list", help="list the query inventory")
    ls.set_defaults(fn=cmd_list)

    sq = sub.add_parser("sql", help="run SQL over the registered tables")
    sq.add_argument("statement")
    sq.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    sq.add_argument("--rows", type=int, default=20)
    sq.set_defaults(fn=cmd_sql)

    q = sub.add_parser("query", help="run a registry query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--rows", type=int, default=20)
    q.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
