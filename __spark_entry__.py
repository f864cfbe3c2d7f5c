"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The actual inventory lives in ``datalakes_and_data_integration_spark.plans``;
this module is a thin adapter.
"""

from __future__ import annotations

import os
from collections.abc import Callable

# Scratch-dir hardening for whoever builds the session AFTER importing
# this module: shuffle/spill files default to /tmp, which this host
# purges on a timer — a purge mid-job deletes live block-manager dirs
# and fails the stage (observed ~25 min into heavy runs; see NOTES.md
# round 4). Spark honors SPARK_LOCAL_DIRS at JVM launch; only a default,
# an explicit setting always wins. The package session factory applies
# the same default via spark.local.dir for sessions it builds itself.
_scratch = os.path.join(
    os.path.expanduser("~"), ".cache", "spark_graft_local"
)
os.makedirs(_scratch, exist_ok=True)
os.environ.setdefault("SPARK_LOCAL_DIRS", _scratch)

from pyspark.sql import DataFrame, SparkSession

from datalakes_and_data_integration_spark import plans

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The capstone: the end-to-end training-corpus manifest — every
    curation decision (lang/quality/dedup/near-dup/eval/contamination/
    split/kept) in one row per document, exercising the text, dedup,
    and graph suites in a single plan.
    """
    return plans.QUERIES["training_corpus_manifest"].spark(
        spark, SMOKE_SF_DIR
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return plans.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query."""
    return plans.all_oracle_sql()
