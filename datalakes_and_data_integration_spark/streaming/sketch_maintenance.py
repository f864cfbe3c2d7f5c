"""Streaming sketch maintenance: HLL register files merged per batch.

The point of a mergeable sketch (plans/sketches.py) is that INCREMENTAL
maintenance is the same operation as distributed aggregation: each
micro-batch produces a 64-row register file, and merging it into the
persisted state is a per-register max — no rescan of history, state size
O(groups x 64) forever. This is the streaming twin of
``distinct_count_hll``: after any number of batches, the maintained
registers are IDENTICAL to the batch-built registers over the union of
the data (max is associative/commutative/idempotent — redelivered
batches are no-ops).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakes_and_data_integration_spark.plans.sketches import (
    _HLL_M,
    _HLL_VBITS,
    _rho_case,
)
from datalakes_and_data_integration_spark.functions.hashing import (
    hash60_sql_spark,
)


def hll_registers(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """(group, reg, mrho) register file for distinct ``key_col`` per
    ``group_col`` — same hash family as plans/sketches.distinct_count_hll."""
    h = hash60_sql_spark(f"CAST({key_col} AS STRING)", seed=7)
    hashed = df.select(
        F.col(group_col).alias("grp"),
        F.expr(f"({h}) % {_HLL_M}").alias("reg"),
        F.expr(f"(({h}) div {_HLL_M}) % {1 << _HLL_VBITS}").alias("val"),
    ).distinct()
    return (
        hashed.select("grp", "reg", F.expr(_rho_case("val")).alias("rho"))
        .groupBy("grp", "reg")
        .agg(F.max("rho").alias("mrho"))
    )


def merge_hll_state(
    spark: SparkSession, state_dir: str, batch_regs: DataFrame
) -> DataFrame:
    """Merge a batch register file into the persisted state: per-(grp,
    reg) max over old + new, rewritten atomically-enough for a single
    writer (stage + swap is operators/upsert's job; state here is tiny).
    Returns the merged registers."""
    if os.path.isdir(state_dir):
        old = spark.read.parquet(state_dir)
        merged = (
            old.unionByName(batch_regs)
            .groupBy("grp", "reg")
            .agg(F.max("mrho").alias("mrho"))
        )
    else:
        merged = batch_regs
    rows = merged.collect()  # scale-ok: O(groups x 64) register rows
    spark.createDataFrame(rows, merged.schema).write.mode(
        "overwrite"
    ).parquet(state_dir)
    return spark.read.parquet(state_dir)


def hll_estimate(regs: DataFrame) -> DataFrame:
    """(grp, hll_est) corrected estimates from a register file — the
    same integer-exact harmonic sum as distinct_count_hll."""
    alpha = 0.709
    summed = regs.groupBy("grp").agg(
        F.sum(
            F.expr("CAST(shiftleft(CAST(1 AS BIGINT), 55 - mrho) AS BIGINT)")
        ).alias("s_present"),
        F.count("*").alias("v_present"),
    )
    e_raw = (
        F.lit(alpha)
        * _HLL_M
        * _HLL_M
        * F.lit(float(1 << 55))
        / (
            F.col("s_present")
            + (F.lit(_HLL_M).cast("bigint") - F.col("v_present"))
            * F.lit(1 << 55).cast("bigint")
        )
    )
    est = summed.select("grp", e_raw.alias("e_raw"), "v_present")
    e = F.when(
        (F.col("e_raw") <= 2.5 * _HLL_M) & (F.col("v_present") < _HLL_M),
        F.lit(float(_HLL_M))
        * F.log(F.lit(float(_HLL_M)) / (F.lit(_HLL_M) - F.col("v_present"))),
    ).otherwise(F.col("e_raw"))
    return est.select("grp", F.round(e, 4).alias("hll_est"))
