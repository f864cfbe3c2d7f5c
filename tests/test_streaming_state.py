"""Cross-micro-batch state test: the applyInPandasWithState sessionizer must
carry open sessions across batch boundaries (maxFilesPerTrigger=1 forces one
micro-batch per input file)."""

from __future__ import annotations

import datetime as dt
import tempfile


def test_session_state_spans_micro_batches(spark):
    from datalakes_and_data_integration_spark.streaming.file_stream import (
        stateful_sessions_stream,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def mk(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    src = tempfile.mkdtemp(prefix="ss_src_")
    # File 1 (micro-batch 1): two events 10 min apart -> one OPEN session.
    spark.createDataFrame(
        [(1, mk(0)), (1, mk(10))], ["user_id", "ts"]
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/f1.parquet")
    # File 2 (micro-batch 2): +15 min continues the session (state must have
    # survived); +2 h starts a new one, CLOSING the first.
    spark.createDataFrame(
        [(1, mk(15)), (1, mk(120))], ["user_id", "ts"]
    ).coalesce(1).write.mode("overwrite").parquet(f"{src}/f2.parquet")

    schema = "user_id bigint, ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", True)
        .parquet(src)
    )
    out = stateful_sessions_stream(stream)
    ckpt = tempfile.mkdtemp(prefix="ss_ckpt_")
    q = (
        out.writeStream.format("memory")
        .queryName("ss_state_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("ss_state_test").collect()
    # Exactly one CLOSED session: minutes 0-15 with 3 events — only correct
    # if batch 2 extended batch 1's open session instead of starting fresh.
    assert len(rows) == 1
    r = rows[0]
    assert r.user_id == 1 and r.n_events == 3
    assert r.session_start == mk(0) and r.session_end == mk(15)
