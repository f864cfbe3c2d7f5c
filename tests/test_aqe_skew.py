"""AQE runtime skew handling: the safety net under every shuffled join.

SCALE.md leans on AQE to split skewed partitions when the explicit
salted-join rewrite isn't applied; this pins that the machinery actually
fires — a sort-merge join over a 90%-hot-key fact must show skew-split
partitions in the adaptive plan.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

_SKEW_CONFS = {
    # Low thresholds so the tiny test dataset trips the skew logic.
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def test_aqe_splits_skewed_join(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        # 95% of fact rows share key 0; payload pads partition size past
        # the lowered threshold.
        fact = spark.range(60_000).select(
            F.when(F.col("id") % 20 != 0, 0)
            .otherwise(F.col("id"))
            .alias("k"),
            F.concat(F.lit("x" * 64), F.col("id")).alias("payload"),
        )
        dim = spark.range(3_000).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        # The bare join, no downstream clustering: a consumer that reuses
        # the join's hash partitioning (e.g. groupBy on the key) makes AQE
        # legitimately refuse to skew-split; the split is only free when
        # nothing downstream needs co-partitioning.
        joined = fact.join(dim, "k")
        # collect() executes THIS DataFrame's QueryExecution; a write or a
        # derived frame would run a different one and this plan would stay
        # isFinalPlan=false.
        rows = joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        # AQE marks the rebalanced join: SortMergeJoin(skew=true).
        assert re.search(r"skew=true", plan), plan
        # And the join is still correct despite the hot key:
        # 57,000 rows with id%20 != 0, plus id=0 itself.
        n_hot = sum(1 for r in rows if r.k == 0)
        assert n_hot == 57_001
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
