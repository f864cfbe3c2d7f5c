"""JSONL / ORC round-trips: schema and value fidelity against the
parquet-loaded truth, and ORC predicate pushdown parity with parquet."""

from __future__ import annotations

import io
import tempfile
from contextlib import redirect_stdout

SF = "/root/testdata/sf0.001"


def _events(spark):
    from datalakes_and_data_integration_spark.plans._util import T

    # props is a JSON string column; keep a typed subset for fidelity.
    return T(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def _rows(df):
    return sorted(
        (r.event_id, r.ts, r.user_id, r.event_type, r.value)
        for r in df.collect()
    )


def test_jsonl_round_trip(spark):
    from datalakes_and_data_integration_spark.sources.formats import (
        read_jsonl,
        write_jsonl,
    )

    truth = _events(spark)
    path = tempfile.mkdtemp(prefix="jsonl_") + "/events"
    write_jsonl(truth, path)
    back = read_jsonl(spark, path, truth.schema)
    assert back.schema == truth.schema
    assert _rows(back) == _rows(truth)


def test_orc_round_trip(spark):
    from datalakes_and_data_integration_spark.sources.formats import (
        read_orc,
        write_orc,
    )

    truth = _events(spark)
    path = tempfile.mkdtemp(prefix="orc_") + "/events"
    write_orc(truth, path)
    back = read_orc(spark, path)
    assert back.schema == truth.schema
    assert _rows(back) == _rows(truth)


def test_orc_pushes_filters(spark):
    """ORC scans must get predicate pushdown like parquet does."""
    from pyspark.sql import functions as F

    from datalakes_and_data_integration_spark.sources.formats import (
        read_orc,
        write_orc,
    )

    truth = _events(spark)
    path = tempfile.mkdtemp(prefix="orcpf_") + "/events"
    write_orc(truth, path)
    q = read_orc(spark, path).filter(F.col("event_type") == "click").select(
        "event_id", "value"
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [" in plan
    assert "PushedFilters: []" not in plan
    assert q.count() == truth.filter(F.col("event_type") == "click").count()
