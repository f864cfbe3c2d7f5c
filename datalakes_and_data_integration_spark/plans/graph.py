"""Graph analytics over the document near-dup graph.

Connected components (dedup_cluster_assignment) answered "which docs are
the same"; PageRank over the same graph answers "which docs are HUBS of
duplication" — template/boilerplate pages sit central in large near-dup
neighborhoods, and their rank is a curation signal (down-weight or drop
hub-like content).

Determinism: PageRank is computed in FIXED-POINT integer arithmetic
(scale 1e12). Every operation — contribution split ``pr // deg``, damping
``(85 * insum) // 100`` — is int64 division/multiplication, identical in
Spark (`div`) and DuckDB (`//`), so after any number of iterations the
register values compare EXACTLY. No float enters until the final
display column. Mass bound: total mass <= 1e12, per-edge sums <<
2^63 — no overflow.

Scale: each iteration is one join (edges x ranks, both hash-partitioned
on the source key — the exchange is reused across iterations) + one
grouped sum on the destination. 5 iterations = 5 bounded shuffles over
the EDGE set (candidates, not the corpus). The dangling-mass
redistribution is deliberately omitted (isolated docs keep base rank);
both engines implement the same variant.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datalakes_and_data_integration_spark.plans._util import T
from datalakes_and_data_integration_spark.plans.dedup import (
    _simhash_pairs_oracle,
    dedup_simhash_pairs,
)
from datalakes_and_data_integration_spark.plans.registry import register

_PR_SCALE = 10**12
_PR_ITERS = 5


def _pagerank_oracle() -> str:
    pairs = _simhash_pairs_oracle()
    steps = []
    for k in range(1, _PR_ITERS + 1):
        steps.append(
            f"""
    pr{k} AS (
      SELECT n.doc_id,
             (15 * (CAST({_PR_SCALE} AS BIGINT) // nc.n)) // 100
               + (85 * coalesce(s.insum, 0)) // 100 AS pr
      FROM nodes n CROSS JOIN nc
      LEFT JOIN (
        SELECT e.dst AS doc_id, sum(p.pr // d.deg) AS insum
        FROM edges e
        JOIN pr{k - 1} p ON p.doc_id = e.src
        JOIN deg d ON d.src = e.src
        GROUP BY e.dst
      ) s ON s.doc_id = n.doc_id
    )"""
        )
    return f"""
    WITH pairs AS ({pairs}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    nodes AS (SELECT doc_id FROM documents),
    nc AS (SELECT count(*) AS n FROM nodes),
    pr0 AS (
      SELECT doc_id, CAST({_PR_SCALE} AS BIGINT) // nc.n AS pr
      FROM nodes CROSS JOIN nc
    ),{",".join(steps)}
    SELECT doc_id, pr AS pr_fixed,
           round(CAST(pr AS DOUBLE) / {float(_PR_SCALE)}, 6) AS pagerank
    FROM pr{_PR_ITERS}
    """


@register(
    "pagerank_dup_hubs",
    oracle=_pagerank_oracle(),
    description=f"PageRank ({_PR_ITERS} iterations, damping 0.85) over the "
    "undirected simhash near-dup graph — duplication-hub centrality for "
    "template/boilerplate detection. Fixed-point int64 arithmetic "
    "(scale 1e12): contribution splits and damping are integer division "
    "on both engines, so register values match EXACTLY after any "
    "iteration count; isolated docs keep base rank (no dangling "
    "redistribution, same variant both sides).",
    tags=("graph", "pagerank", "dedup", "llm-pipeline"),
)
def pagerank_dup_hubs(spark, sf_dir):
    pairs = dedup_simhash_pairs(spark, sf_dir)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # One partitioning on src serves every iteration's join.
    ewd = edges.join(deg, "src").persist()
    nodes = T(spark, sf_dir, "documents").select("doc_id")
    n = nodes.count()  # scale-ok: 1 scalar (node count)
    base = (15 * (_PR_SCALE // n)) // 100
    pr = nodes.select("doc_id", F.lit(_PR_SCALE // n).alias("pr"))
    for _ in range(_PR_ITERS):
        insum = (
            ewd.join(pr.withColumnRenamed("doc_id", "src"), "src")
            .select(
                F.col("dst").alias("doc_id"),
                F.expr("pr div deg").alias("c"),
            )
            .groupBy("doc_id")
            .agg(F.sum("c").alias("insum"))
        )
        pr = nodes.join(insum, "doc_id", "left").select(
            "doc_id",
            F.expr(
                f"CAST({base} AS BIGINT) + (85 * coalesce(insum, CAST(0 AS BIGINT))) div 100"
            ).alias("pr"),
        )
    return pr.select(
        "doc_id",
        F.col("pr").alias("pr_fixed"),
        F.round(F.col("pr").cast("double") / float(_PR_SCALE), 6).alias(
            "pagerank"
        ),
    )
