"""Round-9 ADVICE regression: an EMPTY events table must yield empty
maintained state and an oracle-matching (mostly empty) report from all
three span-derived weekly maintenance queries — not an AttributeError
from None.date() inside _weekly_bounds."""

from __future__ import annotations

import duckdb


def _mk_empty_events(tmpdir: str) -> str:
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT 0::BIGINT AS event_id, TIMESTAMP '2024-01-01' AS ts,
                 0::BIGINT AS user_id, '' AS event_type, 0.0::DOUBLE AS value,
                 '' AS props
          WHERE FALSE
        ) TO '{tmpdir}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return tmpdir


def test_weekly_bounds_empty_is_empty(spark, tmp_path):
    from datalakes_and_data_integration_spark.plans._util import T
    from datalakes_and_data_integration_spark.plans.streaming_extra import (
        _weekly_bounds,
    )

    sf = _mk_empty_events(str(tmp_path))
    assert _weekly_bounds(T(spark, sf, "events")) == []


def test_maintenance_queries_survive_empty_events(spark, tmp_path):
    from datalakes_and_data_integration_spark.plans.experiment import (
        streaming_ab_moments_maintenance,
    )
    from datalakes_and_data_integration_spark.plans.streaming_extra import (
        streaming_bitmap_distinct_maintenance,
        streaming_heavy_hitters_cms,
    )

    sf = _mk_empty_events(str(tmp_path))
    assert streaming_ab_moments_maintenance(spark, sf).collect() == []
    assert streaming_heavy_hitters_cms(spark, sf).collect() == []
    rows = streaming_bitmap_distinct_maintenance(spark, sf).collect()
    assert [(r.event_type, r.n_users) for r in rows] == [("__all__", 0)]
