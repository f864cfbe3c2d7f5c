"""Schema-evolution reads: conform-and-union across schema generations.

Pins the contract of sources/evolution.py: typed nulls for added columns,
widening-only casts, loud failure on narrowing, per-branch predicate
pushdown surviving the union (the scale property — each generation scans
with its own footer schema and its own pushed filters).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as t

from datalakes_and_data_integration_spark.sources.evolution import (
    conform,
    read_evolved,
    schema_diff,
)

TARGET = t.StructType(
    [
        t.StructField("id", t.LongType()),
        t.StructField("val", t.DoubleType()),
        t.StructField("tag", t.StringType()),
    ]
)


@pytest.fixture(scope="module")
def generations(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("evolve")
    g1 = str(root / "gen1")  # id int, val float — pre-widening, no tag
    g2 = str(root / "gen2")  # target schema
    spark.createDataFrame(
        [(1, 1.5), (2, 2.5)], "id int, val float"
    ).write.parquet(g1)
    spark.createDataFrame(
        [(3, 3.5, "x"), (4, 4.5, "y")], "id long, val double, tag string"
    ).write.parquet(g2)
    return g1, g2


def test_read_evolved_conforms_and_unions(spark, generations):
    out = read_evolved(spark, list(generations), TARGET)
    assert out.schema == TARGET
    rows = {r.id: (r.val, r.tag) for r in out.collect()}
    assert rows == {1: (1.5, None), 2: (2.5, None), 3: (3.5, "x"), 4: (4.5, "y")}


def test_mergeschema_cannot_do_this(spark, generations):
    """The reason read_evolved exists: footer merge rejects int32 vs int64."""
    g1, g2 = generations
    with pytest.raises(Exception, match="[Mm]erg|[Ff]ailed|incompatible"):
        spark.read.option("mergeSchema", "true").parquet(g1, g2).collect()


def test_narrowing_refused(spark):
    df = spark.createDataFrame([(1, 1.5)], "id long, val double")
    narrow = t.StructType(
        [t.StructField("id", t.IntegerType()), t.StructField("val", t.DoubleType())]
    )
    with pytest.raises(ValueError, match="non-widening.*id"):
        conform(df, narrow)


def test_extra_columns_policy(spark):
    df = spark.createDataFrame([(1, 1.5, "junk")], "id long, val double, dbg string")
    two = t.StructType(
        [t.StructField("id", t.LongType()), t.StructField("val", t.DoubleType())]
    )
    assert conform(df, two).columns == ["id", "val"]
    with pytest.raises(ValueError, match="unexpected columns.*dbg"):
        conform(df, two, on_extra="error")


def test_pushdown_survives_per_branch(spark, generations):
    out = read_evolved(spark, list(generations), TARGET).filter("id > 2")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # Both generation scans carry their own pushed id filter; no shuffle.
    assert plan.count("PushedFilters: [IsNotNull(id), GreaterThan(id,2)]") == 2
    assert "Exchange" not in plan
    assert [r.id for r in out.collect()] in ([3, 4], [4, 3])


def test_schema_diff_report():
    old = t.StructType(
        [t.StructField("id", t.IntegerType()), t.StructField("gone", t.StringType())]
    )
    diff = {d["column"]: d for d in schema_diff(old, TARGET)}
    assert diff["id"]["change"] == "retyped" and diff["id"]["widening"]
    assert diff["gone"]["change"] == "removed"
    assert diff["val"]["change"] == "added"
    assert diff["tag"]["change"] == "added"
