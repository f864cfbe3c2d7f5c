"""Distributed model training as engine aggregates: logistic regression.

The last step of a curation pipeline is often a lightweight model ON the
lake (a quality classifier over embeddings — the fastText/logreg stage of
CCNet-style pipelines). Full-batch gradient descent maps exactly onto the
engine's strengths: each iteration is ONE map-side-combined aggregation
over the fact table producing a dim-sized gradient (65 values here), the
driver updates the weight vector (model parameters are dim-sized by
definition — a scale-ok collect), and the next iteration's plan is rebuilt
from literals, so lineage stays flat (the IVF k-means pattern, not the
CC-loop pattern — see NOTES.md lineage hazard).

Cross-engine EXACT determinism (the interesting part):

- the per-row logit z = b + w_0·x_0 + ... + w_63·x_63 is a FIXED-ORDER
  left-associated double chain in both engines (Spark inlines the
  weights as literals; the oracle reads them through scalar subqueries)
  — SQL engines do not reassociate floating-point addition, so the
  chains are bit-identical;
- σ(z) = 1/(1+exp(-z)) in double: exp on bit-identical inputs (the same
  empirical contract as ln in source_lang_entropy);
- sums ACROSS rows (the gradient reduction, where partition order would
  bite) are true SUM aggregates over DECIMAL(38,18)-cast double terms —
  exact, order-independent, identical to DuckDB's decimal SUM. Chained
  decimal `+` is deliberately avoided: Spark caps precision at 38 and
  REDUCES SCALE on long chains (allowPrecisionLoss), which silently
  diverges from a decimal SUM;
- the mean-gradient division and weight update are plain double ops in
  fixed order on both sides; weights are emitted through the
  ROUND(DECIMAL, 6) recipe, so a 1-ulp transcendental wobble sits ten
  orders below the rounding grid.

At 100 TB: the per-iteration cost is one scan + a 65-column partial
aggregate — no row ever shuffles; only the reduced gradient state moves.
Swap full-batch for mini-batch sampling or L-BFGS when iterations get
expensive; the aggregation shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datalakes_and_data_integration_spark.plans._util import T
from datalakes_and_data_integration_spark.plans.registry import register

_DIM = 64
_ITERS = 3
_LR = 0.1
_POS_LABEL = 0  # one-vs-rest: label 0 against the others
_POS_WEIGHT = 9.0  # class weight for the ~10% positive class (cost-sensitive GD)


_CHUNK = 8  # parenthesization grain for the logit chain (see _assoc_chain)


def _assoc_chain(bias: str, terms: list[str]) -> str:
    """``((b + c0) + c1) + ...`` where each ``c_i`` is a left-associated
    chunk of {_CHUNK} products.

    The SAME generator builds the Spark and DuckDB expressions, so both
    engines parse the IDENTICAL tree — floating-point addition is not
    associative, and neither engine reassociates it, so equal trees mean
    equal bits. Chunking exists because a flat 65-deep chain exceeds
    DuckDB's expression-binder recursion limit."""
    chunks = []
    for i in range(0, len(terms), _CHUNK):
        chunks.append("(" + " + ".join(terms[i : i + _CHUNK]) + ")")
    return " + ".join([f"({bias})"] + chunks)


def _oracle_z_chain(wrow: str) -> str:
    """The logit chain reading weights from the pivoted one-row CTE."""
    return _assoc_chain(
        f"{wrow}.b",
        [
            f"{wrow}.w{j} * CAST(emb[{j + 1}] AS DOUBLE)"
            for j in range(_DIM)
        ],
    )


def _logreg_oracle() -> str:
    prev = "w0"
    steps = [
        f"""
    rows AS (
      SELECT vec_id, CAST(label = {_POS_LABEL} AS INT) AS y, embedding AS emb
      FROM embeddings
    ),
    n AS (SELECT count(*) AS n FROM rows),
    dims AS (SELECT CAST(i AS INT) AS dim FROM range({_DIM}) r(i)),
    w0 AS (SELECT dim, CAST(0.0 AS DOUBLE) AS w, CAST(0.0 AS DOUBLE) AS b
           FROM dims)"""
    ]
    for k in range(1, _ITERS + 1):
        pivot_cols = ", ".join(
            f"max(CASE WHEN dim = {j} THEN w END) AS w{j}"
            for j in range(_DIM)
        )
        steps.append(
            f"""
    wrow{k} AS (
      SELECT {pivot_cols}, any_value(b) AS b FROM {prev}
    ),
    sig{k} AS (
      SELECT vec_id, y, emb,
             1.0 / (1.0 + exp(-({_oracle_z_chain(f"wrow{k}")}))) AS sig
      FROM rows CROSS JOIN wrow{k}
    ),
    g{k} AS (
      SELECT d.dim,
             CAST(sum(CAST(((CASE WHEN s.y = 1 THEN 9.0 ELSE 1.0 END)
                            * (s.sig - CAST(s.y AS DOUBLE)))
                           * CAST(s.emb[d.dim + 1] AS DOUBLE)
                           AS DECIMAL(38,18))) AS DOUBLE)
               / (SELECT n FROM n) AS gmean
      FROM sig{k} s CROSS JOIN dims d
      GROUP BY d.dim
    ),
    gb{k} AS (
      SELECT CAST(sum(CAST((CASE WHEN s.y = 1 THEN 9.0 ELSE 1.0 END)
                           * (s.sig - CAST(s.y AS DOUBLE)) AS DECIMAL(38,18)))
                  AS DOUBLE) / (SELECT n FROM n) AS gbmean
      FROM sig{k} s
    ),
    w{k} AS (
      SELECT p.dim, p.w - {_LR!r} * g.gmean AS w,
             p.b - {_LR!r} * (SELECT gbmean FROM gb{k}) AS b
      FROM {prev} p JOIN g{k} g USING (dim)
    )"""
        )
        prev = f"w{k}"
    return (
        "WITH "
        + ",".join(steps)
        + f"""
    SELECT dim,
           CAST(ROUND(CAST(w AS DECIMAL(27,12)), 6) AS DOUBLE) AS weight
    FROM {prev}
    UNION ALL
    SELECT -1 AS dim,
           CAST(ROUND(CAST(any_value(b) AS DECIMAL(27,12)), 6) AS DOUBLE)
    FROM {prev}
    """
    )


def _spark_z_chain(w: list[float], b: float) -> str:
    """The same chunk-associated chain with inlined literal weights.

    Spark's `embedding[j]` is 0-based (DuckDB's emb[j+1]); float repr
    round-trips, so the literals parse to the identical doubles the
    oracle's pivoted weight row carries.
    """
    return _assoc_chain(
        f"{b!r}D",
        [f"{w[j]!r}D * CAST(embedding[{j}] AS DOUBLE)" for j in range(_DIM)],
    )


def _train(spark, sf_dir, where: str | None = None):
    """Run the GD loop; returns (labeled frame, weights, bias).

    ``where``: optional SQL predicate restricting the training rows (the
    held-out split) — it lands directly on the scan as a pushed filter."""
    e = T(spark, sf_dir, "embeddings")
    if where is not None:
        e = e.where(where)
    e = e.select(
        "vec_id",
        "embedding",
        (F.col("label") == _POS_LABEL).cast("int").alias("y"),
    )
    n = e.count()  # scale-ok: 1 scalar (training-set size)
    w = [0.0] * _DIM
    b = 0.0
    for _ in range(_ITERS):
        sig = e.select(
            "embedding",
            "y",
            F.expr(f"1.0D / (1.0D + exp(-({_spark_z_chain(w, b)})))").alias(
                "sig"
            ),
        )
        grads = sig.agg(
            *[
                F.expr(
                    f"sum(CAST(((CASE WHEN y = 1 THEN {_POS_WEIGHT!r} ELSE 1.0 END)"
                    f" * (sig - CAST(y AS DOUBLE))) "
                    f"* CAST(embedding[{j}] AS DOUBLE) AS DECIMAL(38,18)))"
                ).alias(f"g{j}")
                for j in range(_DIM)
            ],
            F.expr(
                f"sum(CAST((CASE WHEN y = 1 THEN {_POS_WEIGHT!r} ELSE 1.0 END)"
                f" * (sig - CAST(y AS DOUBLE)) AS DECIMAL(38,18)))"
            ).alias("gb"),
        ).collect()[0]  # scale-ok: one dim-sized gradient row per iteration
        w = [w[j] - _LR * (float(grads[f"g{j}"]) / n) for j in range(_DIM)]
        b = b - _LR * (float(grads["gb"]) / n)
    return e, w, b


@register(
    "logreg_gd_weights",
    oracle=_logreg_oracle(),
    description=f"Distributed logistic-regression training ({_ITERS} "
    f"full-batch GD iterations, lr={_LR}, label {_POS_LABEL} vs rest on "
    "the 64-dim embeddings): each iteration is ONE map-side-combined "
    "65-column aggregate (decimal-exact per-dimension gradient sums over "
    "fixed-order double sigmoid terms); the driver holds only the "
    "dim-sized weight vector and rebuilds the next plan from literals "
    "(flat lineage, IVF pattern). Output: final weights per dimension "
    "(+ bias as dim -1), decimal-rounded. The oracle unrolls the same "
    "three iterations in SQL — weights match cross-engine EXACTLY "
    "because logits are identical left-associated double chains, row "
    "reductions are exact decimal SUMs, and updates are fixed-order "
    "double ops. The 100 TB shape: per iteration one scan, no row "
    "shuffle — only the 65-value gradient moves.",
    tags=("ml", "training", "gradient-descent", "llm-pipeline"),
)
def logreg_gd_weights(spark, sf_dir):
    _, w, b = _train(spark, sf_dir)
    model = spark.createDataFrame(
        [(j, w[j]) for j in range(_DIM)] + [(-1, b)], "dim int, weight double"
    )
    return model.select(
        "dim",
        F.round(F.col("weight").cast("decimal(27,12)"), 6)
        .cast("double")
        .alias("weight"),
    )


def _confusion_oracle() -> str:
    """Reuse the full training unroll, then one scoring pass. The decision
    boundary sigma(z) >= 0.5 is exactly z >= 0, so no transcendental sits
    on the comparison — the predicate is a sign test on bit-identical
    doubles."""
    train = _logreg_oracle()
    with_block = train[: train.rindex("SELECT dim")]
    pivot_cols = ", ".join(
        f"max(CASE WHEN dim = {j} THEN w END) AS w{j}" for j in range(_DIM)
    )
    return (
        with_block
        + f""", wrowF AS (
      SELECT {pivot_cols}, any_value(b) AS b FROM w{_ITERS}
    )
    SELECT r.y AS label_true,
           ({_oracle_z_chain("wrowF")}) >= 0.0 AS pred_pos,
           count(*) AS n
    FROM rows r CROSS JOIN wrowF
    GROUP BY 1, 2
    """
    )


@register(
    "logreg_confusion",
    oracle=_confusion_oracle(),
    description="Training-set confusion matrix of the GD-trained logistic "
    "model (label_true x pred_pos counts): the scoring pass applies the "
    "learned weights as a literal logit chain, and the decision boundary "
    "sigma(z)>=0.5 is evaluated as the sign test z>=0 — no transcendental "
    "on the comparison, so predictions match cross-engine exactly. Scale "
    "shape: one scan + a 4-cell map-side-combined aggregate; the model "
    "rides into the executors as plan literals (nothing joins, nothing "
    "shuffles but the 4 counts).",
    tags=("ml", "evaluation", "llm-pipeline"),
)
def logreg_confusion(spark, sf_dir):
    e, w, b = _train(spark, sf_dir)
    return (
        e.select(
            F.col("y").alias("label_true"),
            F.expr(f"({_spark_z_chain(w, b)}) >= 0.0D").alias("pred_pos"),
        )
        .groupBy("label_true", "pred_pos")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# Held-out evaluation: the honest generalization number. Train on the
# md5-hash 80% split of vec_id (the same deterministic splitter as
# dataset_split_assignment — no rand(), stable on any cluster), score the
# disjoint >=90% test split. Same exactness contract as logreg_confusion.
# ---------------------------------------------------------------------------


def _split_pred_duck() -> tuple[str, str]:
    from datalakes_and_data_integration_spark.functions.hashing import (
        hash60_sql_duck,
    )

    bucket = f"({hash60_sql_duck('CAST(vec_id AS VARCHAR)', seed=7)} % 100)"
    return f"{bucket} < 80", f"{bucket} >= 90"


def _split_pred_spark() -> tuple[str, str]:
    from datalakes_and_data_integration_spark.functions.hashing import (
        hash60_sql_spark,
    )

    bucket = f"({hash60_sql_spark('CAST(vec_id AS STRING)', seed=7)} % 100)"
    return f"{bucket} < 80", f"{bucket} >= 90"


def _holdout_oracle() -> str:
    train_pred, test_pred = _split_pred_duck()
    base = _logreg_oracle()
    # Train only on the 80% split: constrain the rows CTE; score the
    # disjoint test split against the final pivoted weight row.
    base = base.replace(
        "FROM embeddings\n    )",
        f"FROM embeddings\n      WHERE {train_pred}\n    )",
        1,
    )
    with_block = base[: base.rindex("SELECT dim")]
    pivot_cols = ", ".join(
        f"max(CASE WHEN dim = {j} THEN w END) AS w{j}" for j in range(_DIM)
    )
    return (
        with_block
        + f""", wrowF AS (
      SELECT {pivot_cols}, any_value(b) AS b FROM w{_ITERS}
    ),
    test_rows AS (
      SELECT vec_id, CAST(label = {_POS_LABEL} AS INT) AS y, embedding AS emb
      FROM embeddings
      WHERE {test_pred}
    )
    SELECT r.y AS label_true,
           ({_oracle_z_chain("wrowF")}) >= 0.0 AS pred_pos,
           count(*) AS n
    FROM test_rows r CROSS JOIN wrowF
    GROUP BY 1, 2
    """
    )


@register(
    "logreg_holdout_eval",
    oracle=_holdout_oracle(),
    description="Held-out generalization of the GD-trained classifier: "
    "train on the deterministic md5-hash 80% split of vec_id (the "
    "dataset_split_assignment splitter — reproducible on any cluster, no "
    "rand()), score the disjoint 10% test split as a confusion matrix. "
    "Same exactness contract as the trainer (fixed-order logit chains, "
    "decimal-SUM gradients, sign-test decision boundary); the oracle "
    "re-derives the identical training run on the identical subset. "
    "Scale shape: the split predicate is a pushed filter on the train "
    "scans; evaluation is one filtered scan + a 4-cell aggregate.",
    tags=("ml", "evaluation", "split", "llm-pipeline"),
)
def logreg_holdout_eval(spark, sf_dir):
    train_pred, test_pred = _split_pred_spark()
    e, w, b = _train(spark, sf_dir, where=train_pred)
    test = T(spark, sf_dir, "embeddings").where(test_pred).select(
        "embedding",
        (F.col("label") == _POS_LABEL).cast("int").alias("y"),
    )
    return (
        test.select(
            F.col("y").alias("label_true"),
            F.expr(f"({_spark_z_chain(w, b)}) >= 0.0D").alias("pred_pos"),
        )
        .groupBy("label_true", "pred_pos")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# Multi-head training: all 10 one-vs-rest classifiers in ONE scan per
# iteration. The scan-amortization story that matters at 100 TB — training
# K models costs the same data movement as training one: the per-iteration
# aggregate just grows to K*(dim+1) gradient columns (650+10 here), all
# map-side-combined, and the driver update is a K x dim literal matrix.
# ---------------------------------------------------------------------------

_HEADS = 10


def _spark_head_chain(w: list[list[float]], b: list[float], h: int) -> str:
    return _assoc_chain(
        f"{b[h]!r}D",
        [
            f"{w[h][j]!r}D * CAST(embedding[{j}] AS DOUBLE)"
            for j in range(_DIM)
        ],
    )


def _oracle_head_chain(wrow: str, h: int) -> str:
    return _assoc_chain(
        f"{wrow}.b{h}",
        [
            f"{wrow}.w{h}_{j} * CAST(emb[{j + 1}] AS DOUBLE)"
            for j in range(_DIM)
        ],
    )


def _multihead_oracle() -> str:
    sig_case = (
        "(CASE h.head "
        + " ".join(f"WHEN {h} THEN s.sig{h}" for h in range(_HEADS))
        + " END)"
    )
    prev = "w0"
    steps = [
        f"""
    rows AS (SELECT vec_id, label, embedding AS emb FROM embeddings),
    n AS (SELECT count(*) AS n FROM rows),
    dims AS (SELECT CAST(i AS INT) AS dim FROM range({_DIM}) r(i)),
    heads AS (SELECT CAST(i AS INT) AS head FROM range({_HEADS}) r(i)),
    w0 AS (SELECT head, dim, CAST(0.0 AS DOUBLE) AS w,
                  CAST(0.0 AS DOUBLE) AS b
           FROM heads CROSS JOIN dims)"""
    ]
    for k in range(1, _ITERS + 1):
        pivot = ", ".join(
            f"max(CASE WHEN head = {h} AND dim = {j} THEN w END) AS w{h}_{j}"
            for h in range(_HEADS)
            for j in range(_DIM)
        )
        bias_pivot = ", ".join(
            f"max(CASE WHEN head = {h} AND dim = 0 THEN b END) AS b{h}"
            for h in range(_HEADS)
        )
        sig_cols = ", ".join(
            f"1.0 / (1.0 + exp(-({_oracle_head_chain(f'wrow{k}', h)}))) "
            f"AS sig{h}"
            for h in range(_HEADS)
        )
        steps.append(
            f"""
    wrow{k} AS (SELECT {pivot}, {bias_pivot} FROM {prev}),
    sig{k} AS (
      SELECT vec_id, label, emb, {sig_cols}
      FROM rows CROSS JOIN wrow{k}
    ),
    g{k} AS (
      SELECT h.head, d.dim,
             CAST(sum(CAST(((CASE WHEN s.label = h.head THEN {_POS_WEIGHT!r}
                                  ELSE 1.0 END)
                            * ({sig_case}
                               - CAST(CAST(s.label = h.head AS INT) AS DOUBLE)))
                           * CAST(s.emb[d.dim + 1] AS DOUBLE)
                           AS DECIMAL(38,18))) AS DOUBLE)
               / (SELECT n FROM n) AS gmean
      FROM sig{k} s CROSS JOIN heads h CROSS JOIN dims d
      GROUP BY h.head, d.dim
    ),
    gb{k} AS (
      SELECT h.head,
             CAST(sum(CAST((CASE WHEN s.label = h.head THEN {_POS_WEIGHT!r}
                                 ELSE 1.0 END)
                           * ({sig_case}
                              - CAST(CAST(s.label = h.head AS INT) AS DOUBLE))
                           AS DECIMAL(38,18))) AS DOUBLE)
               / (SELECT n FROM n) AS gbmean
      FROM sig{k} s CROSS JOIN heads h
      GROUP BY h.head
    ),
    w{k} AS (
      SELECT p.head, p.dim, p.w - {_LR!r} * g.gmean AS w,
             p.b - {_LR!r} * gb.gbmean AS b
      FROM {prev} p
      JOIN g{k} g ON g.head = p.head AND g.dim = p.dim
      JOIN gb{k} gb ON gb.head = p.head
    )"""
        )
        prev = f"w{k}"
    return (
        "WITH "
        + ",".join(steps)
        + f"""
    SELECT head, dim,
           CAST(ROUND(CAST(w AS DECIMAL(27,12)), 6) AS DOUBLE) AS weight
    FROM {prev}
    UNION ALL
    SELECT head, -1 AS dim,
           CAST(ROUND(CAST(any_value(b) AS DECIMAL(27,12)), 6) AS DOUBLE)
    FROM {prev} GROUP BY head
    """
    )


@register(
    "logreg_multihead_weights",
    oracle=_multihead_oracle(),
    description=f"All {_HEADS} one-vs-rest logistic heads trained "
    f"simultaneously ({_ITERS} GD iterations, class weight "
    f"{_POS_WEIGHT}): ONE scan per iteration feeds one map-side-combined "
    f"{_HEADS * (_DIM + 1)}-column gradient aggregate — training K "
    "models costs the data movement of one, the scan-amortization "
    "property a 100 TB corpus demands. The driver holds the K x dim "
    "literal weight matrix; exactness contract identical to "
    "logreg_gd_weights (fixed-order chains, decimal-SUM gradients, "
    "shared chunked-associativity generator), verified over all 650 "
    "final parameters against the fully-unrolled SQL oracle.",
    tags=("ml", "training", "multi-model", "llm-pipeline"),
)
def logreg_multihead_weights(spark, sf_dir):
    e = T(spark, sf_dir, "embeddings")
    n = e.count()  # scale-ok: 1 scalar (training-set size)
    d = e.select(
        "embedding",
        "label",
        *[
            (F.col("label") == h).cast("int").alias(f"y{h}")
            for h in range(_HEADS)
        ],
    )
    w = [[0.0] * _DIM for _ in range(_HEADS)]
    b = [0.0] * _HEADS
    for _ in range(_ITERS):
        sig = d.select(
            "embedding",
            *[F.col(f"y{h}") for h in range(_HEADS)],
            *[
                F.expr(
                    f"1.0D / (1.0D + exp(-({_spark_head_chain(w, b, h)})))"
                ).alias(f"sig{h}")
                for h in range(_HEADS)
            ],
        )
        grads = sig.agg(
            *[
                F.expr(
                    f"sum(CAST(((CASE WHEN y{h} = 1 THEN {_POS_WEIGHT!r} "
                    f"ELSE 1.0 END)"
                    f" * (sig{h} - CAST(y{h} AS DOUBLE))) "
                    f"* CAST(embedding[{j}] AS DOUBLE) AS DECIMAL(38,18)))"
                ).alias(f"g{h}_{j}")
                for h in range(_HEADS)
                for j in range(_DIM)
            ],
            *[
                F.expr(
                    f"sum(CAST((CASE WHEN y{h} = 1 THEN {_POS_WEIGHT!r} "
                    f"ELSE 1.0 END)"
                    f" * (sig{h} - CAST(y{h} AS DOUBLE)) AS DECIMAL(38,18)))"
                ).alias(f"gb{h}")
                for h in range(_HEADS)
            ],
        ).collect()[0]  # scale-ok: one K x dim gradient row per iteration
        w = [
            [
                w[h][j] - _LR * (float(grads[f"g{h}_{j}"]) / n)
                for j in range(_DIM)
            ]
            for h in range(_HEADS)
        ]
        b = [b[h] - _LR * (float(grads[f"gb{h}"]) / n) for h in range(_HEADS)]
    model = spark.createDataFrame(
        [(h, j, w[h][j]) for h in range(_HEADS) for j in range(_DIM)]
        + [(h, -1, b[h]) for h in range(_HEADS)],
        "head int, dim int, weight double",
    )
    return model.select(
        "head",
        "dim",
        F.round(F.col("weight").cast("decimal(27,12)"), 6)
        .cast("double")
        .alias("weight"),
    )


# ---------------------------------------------------------------------------
# Calibration bins: the reliability-diagram evidence for using the trained
# quality classifier as a sampling weight (CCNet-style pipelines keep
# documents proportionally to classifier score — miscalibrated scores
# silently skew the corpus). Held-out logits are bucketed by milli-logit
# floor(1000*z) (clamped to [-8, 7]); because z is a fixed-order double
# chain, both
# engines compute bit-identical logits and therefore identical bins —
# the whole report is integer counts plus one decimal-routed rate.
# ---------------------------------------------------------------------------


def _calibration_oracle() -> str:
    train_pred, test_pred = _split_pred_duck()
    base = _logreg_oracle()
    base = base.replace(
        "FROM embeddings\n    )",
        f"FROM embeddings\n      WHERE {train_pred}\n    )",
        1,
    )
    with_block = base[: base.rindex("SELECT dim")]
    pivot_cols = ", ".join(
        f"max(CASE WHEN dim = {j} THEN w END) AS w{j}" for j in range(_DIM)
    )
    return (
        with_block
        + f""", wrowF AS (
      SELECT {pivot_cols}, any_value(b) AS b FROM w{_ITERS}
    ),
    test_rows AS (
      SELECT vec_id, CAST(label = {_POS_LABEL} AS INT) AS y, embedding AS emb
      FROM embeddings
      WHERE {test_pred}
    ),
    scored AS (
      SELECT y, ({_oracle_z_chain("wrowF")}) AS z
      FROM test_rows CROSS JOIN wrowF
    )
    SELECT CAST(greatest(least(floor(1000.0 * z), 7), -8) AS BIGINT) AS z_bin,
           count(*) AS n,
           CAST(sum(y) AS BIGINT) AS n_pos,
           CAST(ROUND(CAST(CAST(sum(y) AS DOUBLE) / count(*)
                           AS DECIMAL(27,12)), 6) AS DOUBLE) AS pos_rate
    FROM scored GROUP BY 1
    """
    )


@register(
    "logreg_calibration_bins",
    oracle=_calibration_oracle(),
    description="Reliability diagram of the held-out classifier scores: "
    "train on the md5 80% split, bucket the disjoint 10% split's logits "
    "by floor(1000z) (milli-logit bins, sized to the 3-iteration weight "
    "scale) clamped to [-8, 7], report per-bin count, positives, and "
    "decimal-routed positive rate. The logit is the same fixed-order "
    "double chain as the trainer, so bin membership is bit-identical "
    "cross-engine; the score-as-sampling-weight sanity check a "
    "CCNet-style quality-filtering pipeline publishes. One filtered scan "
    "+ an 8-cell aggregate on top of the shared training iterations.",
    tags=("ml", "evaluation", "calibration", "llm-pipeline"),
)
def logreg_calibration_bins(spark, sf_dir):
    train_pred, test_pred = _split_pred_spark()
    e, w, b = _train(spark, sf_dir, where=train_pred)
    test = T(spark, sf_dir, "embeddings").where(test_pred).select(
        "embedding",
        (F.col("label") == _POS_LABEL).cast("int").alias("y"),
    )
    z = F.expr(_spark_z_chain(w, b))
    return (
        test.select(
            "y",
            F.greatest(F.least(F.floor(F.lit(1000.0) * z), F.lit(7)), F.lit(-8))
            .cast("long")
            .alias("z_bin"),
        )
        .groupBy("z_bin")
        .agg(
            F.count("*").alias("n"),
            F.sum("y").cast("long").alias("n_pos"),
            F.round(
                (F.sum("y").cast("double") / F.count("*")).cast(
                    "decimal(27,12)"
                ),
                6,
            )
            .cast("double")
            .alias("pos_rate"),
        )
    )
