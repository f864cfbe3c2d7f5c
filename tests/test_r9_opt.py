"""Round-9 optimization round: internals changed for speed must stay
bit-identical to the forms the oracles pin.

logreg_kfold_cv's sigmoid chain moved from 5 x 64 inlined weight
literals (unique ~60 KB codegen source per GD iteration -> a Janino
compile per iteration per run) to higher-order folds over ONE weight
array literal (_hof_z). The oracle gate proves end-to-end equality; this
test pins the sharper claim the rewrite rests on: the HOF fold is
BIT-identical to the _assoc_chain tree per row, so any future drift in
chunking or seeding fails fast with a named culprit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datalakes_and_data_integration_spark.plans import ml
from datalakes_and_data_integration_spark.plans._util import T

SF = "/root/testdata/sf0.001"


def test_hof_z_bitwise_equals_assoc_chain(spark):
    w = [
        [((f * 131 + j * 17) % 97) * 0.0137 - 0.61 for j in range(ml._DIM)]
        for f in range(3)
    ]
    b = [0.23 * f - 0.4 for f in range(3)]
    e = T(spark, SF, "embeddings")
    withz = e.selectExpr(
        "vec_id",
        "embedding",
        *[f"{ml._hof_terms(ml._warr_sql(w[f]))} AS t{f}" for f in range(3)],
    ).selectExpr(
        "vec_id",
        *[
            f"({ml._assoc_chain(f'{b[f]!r}D', [f'{w[f][j]!r}D * CAST(embedding[{j}] AS DOUBLE)' for j in range(ml._DIM)])}) AS zlit{f}"
            for f in range(3)
        ],
        *[f"{ml._hof_z(f't{f}', f'{b[f]!r}D')} AS zhof{f}" for f in range(3)],
    )
    # bit-level: compare both the double values (IS DISTINCT FROM keeps
    # NaN) and their string renderings (catches -0.0 vs 0.0).
    cond = " OR ".join(
        f"(zlit{f} IS DISTINCT FROM zhof{f})"
        f" OR (CAST(zlit{f} AS STRING) IS DISTINCT FROM"
        f" CAST(zhof{f} AS STRING))"
        for f in range(3)
    )
    assert withz.filter(F.expr(cond)).count() == 0
    assert withz.count() > 0


def test_kfold_counts_match_groupby(spark):
    """The fold counts now ride iteration 1's exploded aggregate via the
    dim = 0 slice; that equals groupBy(fold).count() exactly when every
    embedding explodes to >= 1 element — pin that invariant and the
    count equality."""
    e = T(spark, SF, "embeddings").selectExpr(
        "vec_id",
        "embedding",
        f"{ml._fold_sql_spark()} AS fold",
    )
    assert e.filter(F.expr("size(embedding) < 1")).count() == 0
    direct = {
        r["fold"]: r["cnt"]
        for r in e.groupBy("fold").agg(F.count("*").alias("cnt")).collect()
    }
    via_dim0 = {
        r["fold"]: r["cnt"]
        for r in e.select("fold", F.posexplode("embedding").alias("dim", "x"))
        .filter("dim = 0")
        .groupBy("fold")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert direct == via_dim0
