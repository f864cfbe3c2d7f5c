"""Similarity search over the ``embeddings`` table (64-dim float vectors).

- Brute-force cosine top-k: the exactness baseline. All arithmetic is
  performed in double with an identical operation order in Spark and DuckDB
  (sequential left-fold dot products), so values match bit-for-bit; ranking
  additionally orders on the 6-decimal-rounded cosine to be robust.
- Hyperplane-LSH-bucketed top-k: the scale path. 8 random-hyperplane signs
  (constants derived from md5 at plan-build time — functions/hashing.py, so
  both engines see identical planes) bucket vectors; candidates come only
  from the same bucket, turning the O(n^2) cross join into a per-bucket
  join. At 100 TB: repartition by bucket, broadcast nothing, and the
  quadratic term is bounded by the largest bucket.
- Near-dup pairs: cosine threshold over the bucketed candidates' exact
  scores — the embedding analogue of MinHash verify.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datalakes_and_data_integration_spark.functions.hashing import hash60_py
from datalakes_and_data_integration_spark.plans._util import T, spread
from datalakes_and_data_integration_spark.plans.registry import register

_DIM = 64
_TOPK = 5

# Deterministic training sample shared by EVERY k-means stage in the
# ANN family (the IVF coarse quantizer here; the PQ codebooks and the
# IVFADC/residual compositions in similarity_extra.py): vectors whose
# md5(vec_id) hex digest sorts below a threshold derived from the corpus
# size in pure INTEGER arithmetic — rate = min(1/4, TRAIN_SAMPLE_CAP/n).
# Below the cap this is the historical 25% fraction (threshold '400000'
# selects exactly the old "md5 < '4'" sample); past n = 4*CAP the sample
# SIZE holds at ~TRAIN_SAMPLE_CAP — the faiss shape, a fixed-size
# training set independent of corpus size, so training cost stops being
# O(corpus) (README "Cluster deployment deltas"). Both the Spark filter
# (``train_sample``, threshold resolved to a literal from the caller's
# one scalar count) and the DuckDB oracle predicate (``TRAIN_SAMPLE_
# PRED``, a scalar subquery over count(*)) derive from the same
# cap/scale constants, so the engines cannot drift (ADVICE r5).
TRAIN_SAMPLE_CAP = 65536  # target max training vectors at scale
_TS_SCALE = 16 ** 6  # threshold granularity: 6 hex digits
_TS_QUARTER = _TS_SCALE // 4  # the 25% fraction's threshold


def train_sample_hex(n: int) -> str:
    """6-hex-digit md5-prefix threshold for an n-vector corpus: a digest
    sorting below it marks a training vector. Integer arithmetic only
    (no float rate), mirrored digit for digit by the DuckDB twin inside
    TRAIN_SAMPLE_PRED."""
    t = min(_TS_QUARTER, (TRAIN_SAMPLE_CAP * _TS_SCALE) // max(n, 1))
    return format(t, "06x")


TRAIN_SAMPLE_PRED = (
    "md5(CAST(vec_id AS VARCHAR)) < (SELECT lower(lpad(to_hex("
    f"least({_TS_QUARTER}, (CAST({TRAIN_SAMPLE_CAP} AS BIGINT) "
    f"* {_TS_SCALE}) // count(*))), 6, '0')) FROM embeddings)"
)


def train_sample(df, n: int):
    """Spark twin of TRAIN_SAMPLE_PRED for an n-vector corpus. The
    threshold is a literal (callers pay one scalar count), content-
    addressed so oracles reproduce it with a WHERE clause; recall
    premise pinned by tests/test_sampled_training.py, threshold parity
    by tests/test_train_sample_cap.py."""
    return df.filter(
        F.md5(F.col("vec_id").cast("string")) < train_sample_hex(n)
    )

# --- shared expression builders (Spark SQL | DuckDB SQL kept adjacent) -----


# Spark-side dots/norms are UNROLLED 64-term expressions, not
# aggregate()/zip_with() lambdas: higher-order functions are interpreted
# per element (measured 37s for 4M pairs at sf0.1), while the unrolled form
# whole-stage-codegens (~10x). Addition is left-associative, so the IEEE
# operation order is identical to the oracle's sequential list_reduce fold.


def _norm2_spark(col: str) -> str:
    return " + ".join(
        f"CAST({col}[{i}] AS DOUBLE) * CAST({col}[{i}] AS DOUBLE)"
        for i in range(_DIM)
    )


def _norm2_duck(col: str) -> str:
    return (
        f"list_reduce(list_transform({col}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
        f"(a, v) -> a + v)"
    )


def _dot_spark(a: str, b: str) -> str:
    return " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)"
        for i in range(_DIM)
    )


def _dot_duck(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, {_DIM} + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (acc, v) -> acc + v)"
    )


# Rows of corpus per driver-side chunk: 250k rows x 64 dims x 8 B ≈ 128 MB of
# float64 per broadcast — bounds peak driver heap regardless of corpus size.
_CORPUS_CHUNK_ROWS = 250_000


def _corpus_chunk_broadcasts(spark, e):
    """Broadcast the corpus in bounded driver-side chunks.

    The hybrid kernels need the corpus resident next to every probe
    partition. A single ``collect()`` of the whole table is a driver-OOM at
    100 TB, so instead: chunk ci = rows with pmod(vec_id, n_chunks) == ci (a
    distributed filter evaluated on the executors), pulled one chunk at a
    time, converted to numpy, broadcast, and the driver-side reference
    dropped before the next chunk is pulled — broadcast payloads live in the
    block manager, so peak driver heap is ONE chunk (~128 MB), not the
    corpus. Yields a Broadcast[(ids, C, nrm)] per chunk; norms use the
    oracle's sequential per-dimension accumulation order.
    """
    import numpy as np

    n = e.count()
    n_chunks = max(1, -(-n // _CORPUS_CHUNK_ROWS))
    base = e.select("vec_id", "embedding")
    for ci in range(n_chunks):
        chunk = (
            base
            if n_chunks == 1
            else base.filter(F.pmod(F.col("vec_id"), F.lit(n_chunks)) == ci)
        )
        rows = chunk.collect()  # scale-ok: bounded by _CORPUS_CHUNK_ROWS
        if not rows:
            continue
        ids = np.array([r.vec_id for r in rows], dtype=np.int64)
        C = np.array([r.embedding for r in rows], dtype=np.float32).astype(
            np.float64
        )
        del rows
        norm2 = np.zeros(len(C))
        for d_i in range(C.shape[1]):
            norm2 += C[:, d_i] * C[:, d_i]
        yield spark.sparkContext.broadcast((ids, C, np.sqrt(norm2)))


# ---------------------------------------------------------------------------
# Brute-force cosine top-k.
# ---------------------------------------------------------------------------


@register(
    "ann_topk_bruteforce",
    oracle=f"""
    WITH normed AS (
      SELECT vec_id, embedding, sqrt({_norm2_duck('embedding')}) AS nrm
      FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
             round({_dot_duck('a.embedding', 'b.embedding')} / a.nrm / b.nrm, 6)
               AS cos_sim
      FROM normed a JOIN normed b ON a.vec_id <> b.vec_id
    )
    SELECT vec_id, neighbor_id, cos_sim, rank FROM (
      SELECT vec_id, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM pairs
    ) WHERE rank <= {_TOPK}
    """,
    description=f"Exact cosine top-{_TOPK} neighbors per vector (brute-force "
    "baseline): double-precision sequential-fold dot products, deterministic "
    "rank tiebreak on neighbor id.",
    tags=("similarity", "ann", "llm-pipeline"),
    bench=True,
)
def ann_topk_bruteforce(spark, sf_dir):
    e = T(spark, sf_dir, "embeddings")
    normed = e.select(
        "vec_id",
        "embedding",
        F.expr(f"sqrt({_norm2_spark('embedding')})").alias("nrm"),
    )
    # The non-equi self-join is a BroadcastNestedLoopJoin: parallelism = the
    # STREAM side's partition count, and a small parquet file is 1 partition.
    # Hash-repartition the probe side by vec_id — every core gets a slice of
    # the O(n^2) work, and the top-k window (partitionBy vec_id) inherits the
    # partitioning instead of shuffling all n^2 pair rows again. At 100 TB
    # this becomes block-wise: probe partitions stream against a broadcast
    # (or chunked) corpus; the quadratic term is per-block.
    a = spread(normed, spark, by="vec_id").alias("a")
    b = normed.alias("b")
    pairs = a.join(b, F.col("a.vec_id") != F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("b.vec_id").alias("neighbor_id"),
        F.round(
            F.expr(_dot_spark("a.embedding", "b.embedding"))
            / F.col("a.nrm")
            / F.col("b.nrm"),
            6,
        ).alias("cos_sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOPK)
        .select("vec_id", "neighbor_id", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# Hyperplane-LSH bucketing + in-bucket top-k (the scale path).
# Planes are ±1 vectors: component (p, d) = +1 iff md5-bit of "plane:p:d".
# ---------------------------------------------------------------------------

_PLANES = 8
_SIGNS = [
    [1 if hash60_py(f"plane:{p}:{d}") & 1 else -1 for d in range(_DIM)]
    for p in range(_PLANES)
]


def _bucket_spark(col: str) -> str:
    terms = []
    for p in range(_PLANES):
        dot = " + ".join(
            f"CAST({col}[{d}] AS DOUBLE) * ({_SIGNS[p][d]})" for d in range(_DIM)
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def _bucket_duck(col: str) -> str:
    terms = []
    for p in range(_PLANES):
        arr = f"[{', '.join(str(s) for s in _SIGNS[p])}]"
        dot = (
            f"list_reduce(list_transform(range(1, {_DIM} + 1), "
            f"i -> CAST({col}[i] AS DOUBLE) * ({arr})[i]), (a, v) -> a + v)"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


@register(
    "ann_topk_lsh_bucketed",
    oracle=f"""
    WITH normed AS (
      SELECT vec_id, embedding, sqrt({_norm2_duck('embedding')}) AS nrm,
             {_bucket_duck('embedding')} AS bucket
      FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS vec_id, a.bucket AS bucket, b.vec_id AS neighbor_id,
             round({_dot_duck('a.embedding', 'b.embedding')} / a.nrm / b.nrm, 6)
               AS cos_sim
      FROM normed a JOIN normed b
        ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    )
    SELECT vec_id, bucket, neighbor_id, cos_sim, rank FROM (
      SELECT vec_id, bucket, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM pairs
    ) WHERE rank <= {_TOPK}
    """,
    description=f"LSH-bucketed approximate top-{_TOPK}: {_PLANES} md5-derived "
    "random-hyperplane signs bucket the vectors; candidates and the "
    "quadratic cost stay inside buckets (the 100 TB path).",
    tags=("similarity", "ann", "lsh", "llm-pipeline"),
    bench=True,
)
def ann_topk_lsh_bucketed(spark, sf_dir):
    e = T(spark, sf_dir, "embeddings")
    # persist: both self-join sides evaluate the 8x64-term bucket expression
    # otherwise (broadcast + stream subplans don't share). spread BEFORE
    # persist: a small parquet scan is one partition, and the cached
    # stream side of the bucket self-join would score every candidate
    # pair on one core (measured 6.9 s vs 2.1 s for the 9x-probe
    # multiprobe variant at the 20k decade — the only difference was
    # this missing repartition; no-op on a real cluster where the scan
    # already has >= cores splits).
    normed = spread(
        e.select(
            "vec_id",
            "embedding",
            F.expr(f"sqrt({_norm2_spark('embedding')})").alias("nrm"),
            F.expr(_bucket_spark("embedding")).alias("bucket"),
        ),
        spark,
        by="vec_id",
    ).persist()
    a = normed.alias("a")
    b = normed.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("a.bucket").alias("bucket"),
        F.col("b.vec_id").alias("neighbor_id"),
        F.round(
            F.expr(_dot_spark("a.embedding", "b.embedding"))
            / F.col("a.nrm")
            / F.col("b.nrm"),
            6,
        ).alias("cos_sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOPK)
        .select("vec_id", "bucket", "neighbor_id", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# Cosine near-duplicate pairs (threshold over exact scores).
# ---------------------------------------------------------------------------

_NEAR_DUP_MIN = 0.35


@register(
    "embedding_near_dup",
    oracle=f"""
    WITH normed AS (
      SELECT vec_id, embedding, label, sqrt({_norm2_duck('embedding')}) AS nrm
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           a.label AS label_a, b.label AS label_b,
           round({_dot_duck('a.embedding', 'b.embedding')} / a.nrm / b.nrm, 6)
             AS cos_sim
    FROM normed a JOIN normed b ON a.vec_id < b.vec_id
    WHERE round({_dot_duck('a.embedding', 'b.embedding')} / a.nrm / b.nrm, 6)
          >= {_NEAR_DUP_MIN}
    """,
    description=f"Embedding-cosine near-duplicate pairs (cosine >= "
    f"{_NEAR_DUP_MIN}) with label agreement — the embedding analogue of "
    "MinHash verify. DEFINITION/ORACLE FORM ONLY: this one-line "
    "expression join is the semantic definition and the truth anchor "
    "for the recall audits; the OPERATIONAL form is "
    "embedding_near_dup_hybrid (byte-identical result — same oracle — "
    "at block-wise cost: Catalyst pushes the threshold into the BNLJ "
    "condition here, where the 64-term dot evaluates interpreted per "
    "pair — measured 857 s vs the hybrid's 47.8 s at the 20k decade). "
    "Compositions must use the hybrid (ann_topk_bruteforce precedent; "
    "pinned by test_label_eval_reports_avoid_bnlj_kernel).",
    tags=("similarity", "dedup", "llm-pipeline"),
)
def embedding_near_dup(spark, sf_dir):
    e = T(spark, sf_dir, "embeddings")
    normed = e.select(
        "vec_id",
        "embedding",
        "label",
        F.expr(f"sqrt({_norm2_spark('embedding')})").alias("nrm"),
    )
    # Same BroadcastNestedLoopJoin parallelism fix as ann_topk_bruteforce.
    a = spread(normed, spark, by="vec_id").alias("a")
    b = normed.alias("b")
    cos = F.round(
        F.expr(_dot_spark("a.embedding", "b.embedding"))
        / F.col("a.nrm")
        / F.col("b.nrm"),
        6,
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= _NEAR_DUP_MIN)
    )


# ---------------------------------------------------------------------------
# IVF-style ANN: deterministic k-means coarse quantizer (Lloyd iterations as
# DataFrame jobs), then probe the nearest inverted lists only.
# ---------------------------------------------------------------------------

_IVF_K = 16  # centroids / inverted lists
_IVF_ITERS = 5  # Lloyd iterations
_IVF_PROBE = 6  # lists probed per query
_IVF_REP = 3  # lists each corpus vector is assigned to (multi-assignment)

# Fixed-point quantization that makes the k-means EXACTLY cross-engine
# reproducible (the reason ann_topk_ivf can carry a full DuckDB oracle even
# though Lloyd iteration is "not SQL-expressible" in float arithmetic):
# - centroid coordinates live as integers ms = floor(mean * 1e9) (floor of
#   an exact-int ratio: per-cluster SUM(floor(x*1e9)) // count, every step
#   exact in int64 on both engines);
# - squared distances are SUM(floor(diff^2 * 1e12)) in int64 — the fold is
#   exact, so argmin/probe ranking (ties -> smaller cluster id) is
#   deterministic and engine-independent.
# Value ranges (embeddings in [-0.6, 0.6], n <= 25k at gate scales) keep
# every intermediate far below 2^53, so the double->int quantization itself
# is exact; the 1e-9 centroid / 1e-12 distance granularity is ~1e6x finer
# than the distance gaps that matter, so recall is unchanged
# (tests/test_ivf_recall.py still pins >= 0.9).
_IVF_CSCALE = "1e9"  # centroid fixed-point scale
_IVF_DSCALE = "1e12"  # squared-distance fixed-point scale


def _dist2_to_centroid(mvec: list[int]) -> "F.Column":
    """Fixed-point squared L2 distance from `embedding` to a centroid given
    as floor(c*1e9) integer literals, as a higher-order aggregate over an
    array literal. Interpreted per element — deliberately NOT unrolled: the
    distance runs over n rows (not n^2 pairs), so execution is cheap, while
    K unrolled 64-term expressions per assignment dominated the query with
    Janino compile time (measured ~4s of the ~13s gate cost)."""
    lits = ", ".join(f"{m}L" for m in mvec)
    s = _IVF_CSCALE
    return F.expr(
        f"aggregate(zip_with(embedding, array({lits}), "
        f"(x, m) -> CAST(floor((CAST(x AS DOUBLE) - CAST(m AS DOUBLE)/{s}) "
        f"* (CAST(x AS DOUBLE) - CAST(m AS DOUBLE)/{s}) * {_IVF_DSCALE}) "
        f"AS BIGINT)), "
        f"CAST(0 AS BIGINT), (a, v) -> a + v)"
    )


def _ivf_core_blocks() -> list[str]:
    """DuckDB replica of the IVF training chain: md5-seeded init,
    _IVF_ITERS unrolled Lloyd iterations in the same int64 fixed-point
    arithmetic as the Spark side, ending with ``af`` — the final
    per-(vec, cluster) assignment relation ranked by distance (rn = 1 is
    the primary list). Seed ranking and the Lloyd assignments a1..aN run
    over the deterministic corpus-capped md5 sample (``tdims`` — the
    Spark side's training frame); only the final ``af`` assignment scans
    the corpus. Shared by _ivf_oracle and the nprobe recall curve."""
    cs, ds = _IVF_CSCALE, _IVF_DSCALE
    samp = TRAIN_SAMPLE_PRED

    def assign(name: str, cents: str, rel: str = "dims") -> str:
        return f"""
    {name} AS (
      SELECT vec_id, cluster,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dist, cluster) AS rn
      FROM (
        SELECT v.vec_id, c.cluster,
               sum(CAST(floor((v.x - CAST(c.ms AS DOUBLE)/{cs})
                              * (v.x - CAST(c.ms AS DOUBLE)/{cs})
                              * {ds}) AS BIGINT)) AS dist
        FROM {rel} v JOIN {cents} c ON c.d = v.d
        GROUP BY v.vec_id, c.cluster
      )
    )"""

    blocks = [
        f"""
    dims AS (
      SELECT vec_id, i AS d, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, range(1, {_DIM} + 1) r(i)
    ),
    tdims AS (
      SELECT * FROM dims WHERE {samp}
    ),
    seeds AS (
      SELECT vec_id,
             row_number() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cluster
      FROM embeddings
      WHERE {samp}
      QUALIFY cluster < {_IVF_K}
    ),
    c0 AS (
      SELECT s.cluster, v.d, CAST(floor(v.x * {cs}) AS BIGINT) AS ms
      FROM seeds s JOIN dims v ON v.vec_id = s.vec_id
    )"""
    ]
    for k in range(1, _IVF_ITERS + 1):
        blocks.append(assign(f"a{k}", f"c{k - 1}", "tdims"))
        blocks.append(f"""
    c{k} AS (
      SELECT p.cluster, p.d,
             coalesce(CAST(floor(CAST(s.sv AS DOUBLE) / s.n) AS BIGINT),
                      p.ms) AS ms
      FROM c{k - 1} p
      LEFT JOIN (
        SELECT a.cluster, v.d,
               sum(CAST(floor(v.x * {cs}) AS BIGINT)) AS sv,
               count(*) AS n
        FROM (SELECT vec_id, cluster FROM a{k} WHERE rn = 1) a
        JOIN tdims v ON v.vec_id = a.vec_id
        GROUP BY a.cluster, v.d
      ) s ON s.cluster = p.cluster AND s.d = p.d
    )""")
    blocks.append(assign("af", f"c{_IVF_ITERS}"))
    return blocks


def _ivf_oracle() -> str:
    """Probe/rep candidate generation + exact cosine re-rank over the
    shared training chain (_ivf_core_blocks)."""
    blocks = _ivf_core_blocks()
    blocks.append(f"""
    cand AS (
      SELECT DISTINCT q.vec_id AS q_id, m.vec_id AS n_id
      FROM (SELECT vec_id, cluster FROM af WHERE rn <= {_IVF_PROBE}) q
      JOIN (SELECT vec_id, cluster FROM af WHERE rn <= {_IVF_REP}) m
        ON m.cluster = q.cluster AND m.vec_id <> q.vec_id
    ),
    normed AS (
      SELECT vec_id, embedding, sqrt({_norm2_duck('embedding')}) AS nrm
      FROM embeddings
    ),
    scored AS (
      SELECT c.q_id AS vec_id, c.n_id AS neighbor_id,
             round({_dot_duck('a.embedding', 'b.embedding')}
                   / a.nrm / b.nrm, 6) AS cos_sim
      FROM cand c
      JOIN normed a ON a.vec_id = c.q_id
      JOIN normed b ON b.vec_id = c.n_id
    )""")
    return f"""
    WITH {",".join(blocks)}
    SELECT vec_id, neighbor_id, cos_sim, rank FROM (
      SELECT vec_id, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= {_TOPK}
    """


@register(
    "ann_topk_ivf",
    oracle=_ivf_oracle(),
    description=f"IVF ANN: {_IVF_K}-centroid k-means coarse quantizer "
    f"({_IVF_ITERS} Lloyd iterations as DataFrame aggregates, deterministic "
    f"md5-seeded init) with multi-assignment — each corpus vector joins its "
    f"{_IVF_REP} nearest inverted lists, each query probes its {_IVF_PROBE} "
    "nearest — then exact cosines rank the deduplicated candidates. "
    "Centroids and distances use int64 fixed-point arithmetic (floor-"
    "quantized at 1e-9 / 1e-12 — granularity ~1e6x below meaningful "
    "distance gaps), which makes every Lloyd step EXACTLY reproducible "
    "cross-engine: the full pipeline, k-means included, is hash-checked "
    "against an unrolled DuckDB oracle. Measured recall 0.96+ vs "
    "ann_topk_bruteforce at gate scale (pinned by tests/test_ivf_recall.py). "
    "The synthetic corpus is near-isotropic (max pairwise cosine ~0.51), "
    "which is the hardest case for IVF — the candidate fraction at this "
    "recall is ~0.8 here, while on real clustered embeddings the same "
    "PROBE/K shape prunes far harder. Since round 7 candidate generation "
    "and scoring run in a vectorized scan kernel: probe/rep membership "
    "is one int64 bitmask per side (K <= 64), candidates are a bitwise "
    "AND against bounded corpus-chunk broadcasts, exact cosines run in "
    "the hybrid kernel's sequential fold, and margin-guarded top-k "
    "candidates return to Spark for the codegen re-score.",
    tags=("similarity", "ann", "ivf", "llm-pipeline"),
)
def ann_topk_ivf(spark, sf_dir):
    return _ivf_topk_multi(spark, sf_dir)[0][1]


def _ivf_topk_multi(spark, sf_dir, probes=(_IVF_PROBE,), queries=None):
    """The IVF pipeline with the training chain shared across a probe
    SWEEP: one md5-seeded k-means fit + one corpus assignment pass, then
    per-probe candidate kernels over the same broadcast corpus chunks —
    the faiss nprobe-tuning loop's cost shape (training once, probing N
    ways). Returns ``[(probe, topk_df), ...]`` in ``probes`` order.

    ``queries`` (optional narrow (vec_id) frame) restricts the PROBE side
    to an eval sample before the kernel — the recall-curve harness shape;
    corpus/list sides are untouched. Default args reproduce ann_topk_ivf
    byte-identically (probe_lists sliced at max(probes) == _IVF_PROBE and
    masks built from the first _IVF_PROBE entries)."""
    max_p = max(probes)
    e = T(spark, sf_dir, "embeddings")
    normed = spread(
        e.select(
            "vec_id",
            "embedding",
            F.expr(f"sqrt({_norm2_spark('embedding')})").alias("nrm"),
        ),
        spark,
        by="vec_id",
    ).persist()

    # Training runs over the deterministic corpus-capped md5 sample (the
    # 100 TB shape — faiss trains coarse quantizers on a bounded
    # training set regardless of corpus size; only the final assignment
    # scans the corpus). train_sample is TRAIN_SAMPLE_PRED's Spark twin
    # — both derive from the same cap/scale constants, so the engines
    # cannot drift.
    n_corpus = normed.count()  # scale-ok: 1 scalar count (threshold literal)
    train = train_sample(normed, n_corpus)

    # Deterministic init: the K training vectors with the smallest
    # md5(vec_id).
    import math

    seeds = (
        train.select(
            "vec_id", "embedding", F.md5(F.col("vec_id").cast("string")).alias("h")
        )
        .orderBy("h", "vec_id")
        .limit(_IVF_K)
        .collect()  # scale-ok: K seed rows
    )
    cscale = float(_IVF_CSCALE)
    centroids = [
        [math.floor(float(x) * cscale) for x in r.embedding] for r in seeds
    ]

    def assign(df):
        """Nearest centroid by squared L2 (ties -> smallest centroid id),
        the PROBE nearest lists (query side) and the REP nearest lists
        (corpus multi-assignment), all from one distance-array column."""
        dists = F.array(*[_dist2_to_centroid(c) for c in centroids])
        ranked = (
            f"array_sort(arrays_zip(d, sequence(0, {_IVF_K - 1})))"
        )
        return (
            df.withColumn("d", dists)
            .withColumn(
                "cluster",
                F.expr("CAST(array_position(d, array_min(d)) - 1 AS INT)"),
            )
            .withColumn(
                "probe_lists",
                F.expr(
                    f"transform(slice({ranked}, 1, {max_p}), "
                    f"x -> CAST(x['1'] AS INT))"
                ),
            )
            .withColumn(
                "rep_lists",
                F.expr(
                    f"transform(slice({ranked}, 1, {_IVF_REP}), "
                    f"x -> CAST(x['1'] AS INT))"
                ),
            )
            .drop("d")
        )

    for _ in range(_IVF_ITERS):
        # Update step: per-cluster mean over the TRAINING sample
        # (distributed agg, K rows collected — the standard Spark k-means
        # shape: tiny driver state, big data stays distributed).
        means = (
            assign(train)
            .groupBy("cluster")
            .agg(
                F.count("*").alias("n"),
                *[
                    F.sum(
                        F.expr(
                            f"CAST(floor(CAST(embedding[{i}] AS DOUBLE) "
                            f"* {_IVF_CSCALE}) AS BIGINT)"
                        )
                    ).alias(f"s{i}")
                    for i in range(_DIM)
                ],
            )
            .collect()  # scale-ok: K centroid rows per Lloyd iteration
        )
        # Python // floors like the oracle's floor(sum/count); both exact
        # (cluster sums stay far below 2^53).
        by_id = {
            r.cluster: [r[f"s{i}"] // r.n for i in range(_DIM)] for r in means
        }
        centroids = [by_id.get(k, centroids[k]) for k in range(_IVF_K)]

    final = assign(normed).persist()
    # Candidate generation + exact scoring in a vectorized kernel
    # (round 7, VERDICT r6 #2 — at the 20k decade the explode/join/
    # distinct candidate stream plus the per-pair codegen scoring ran
    # 64 s, 4x slower than the hybrid exact scan of the SAME corpus):
    # with K <= 64 lists, probe/rep membership is one int64 bitmask per
    # side, so the candidate set is a bitwise AND against the broadcast
    # corpus chunk (identical to the exploded equi-join's distinct pair
    # set), and the exact cosine runs in the hybrid kernel's sequential
    # per-dimension fold (bit-identical doubles). Per chunk, candidates
    # within _MARGIN of the raw 5th best go back to Spark for the
    # authoritative codegen re-score + rounded ranking — the
    # ann_topk_bruteforce_hybrid margin argument verbatim (chunk-local
    # kth <= global kth, so each chunk keeps a superset of its global
    # top-k members; no shortlist cut exists here to complicate it).
    import numpy as np
    import pandas as pd

    corpus_df = final.select("vec_id", "embedding", "nrm", "rep_lists")

    def build(rows):
        return (
            np.array([r.vec_id for r in rows], dtype=np.int64),
            np.array(
                [r.embedding for r in rows], dtype=np.float32
            ).astype(np.float64),
            np.array([r.nrm for r in rows], dtype=np.float64),
            np.array(
                [sum(1 << int(c) for c in r.rep_lists) for r in rows],
                dtype=np.int64,
            ),
        )

    def make_scan(bc, n_probe):
        def scan(batches):
            import numpy as np

            ids, E, nb, rep_mask = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                q_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
                Q = np.array(
                    [np.asarray(v, dtype=np.float32) for v in pdf["embedding"]]
                ).astype(np.float64)
                q_nrm = pdf["nrm"].to_numpy(dtype=np.float64)
                pmasks = np.array(
                    [
                        sum(1 << int(c) for c in pl[:n_probe])
                        for pl in pdf["probe_lists"]
                    ],
                    dtype=np.int64,
                )
                out_q, out_n = [], []
                for i in range(len(q_ids)):
                    sel = ((rep_mask & pmasks[i]) != 0) & (ids != q_ids[i])
                    cand_i = np.nonzero(sel)[0]
                    if cand_i.size == 0:
                        continue
                    Ec = E[cand_i]
                    acc = np.zeros(cand_i.size)
                    for d_i in range(E.shape[1]):
                        acc += Q[i, d_i] * Ec[:, d_i]
                    cos = (acc / q_nrm[i]) / nb[cand_i]
                    k = min(_TOPK, cos.size)
                    kth = np.partition(cos, -k)[-k]
                    keep = np.nonzero(cos >= kth - _MARGIN)[0]
                    out_q.extend([q_ids[i]] * keep.size)
                    out_n.extend(ids[cand_i[keep]].tolist())
                yield pd.DataFrame({"q_id": out_q, "n_id": out_n})

        return scan

    probe = final.select("vec_id", "embedding", "nrm", "probe_lists")
    if queries is not None:
        probe = probe.join(queries.select("vec_id"), "vec_id")
    n_chunks = max(1, -(-n_corpus // _CORPUS_CHUNK_ROWS))
    bcs = []
    for ci in range(n_chunks):
        chunk = (
            corpus_df
            if n_chunks == 1
            else corpus_df.filter(
                F.pmod(F.col("vec_id"), F.lit(n_chunks)) == ci
            )
        )
        rows = chunk.collect()  # scale-ok: bounded by _CORPUS_CHUNK_ROWS
        if not rows:
            continue
        bcs.append(spark.sparkContext.broadcast(build(rows)))
    qv = final.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    nv = final.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("n_emb"),
        F.col("nrm").alias("n_nrm"),
    )
    cos = F.round(
        F.expr(_dot_spark("q_emb", "n_emb")) / F.col("q_nrm") / F.col("n_nrm"), 6
    )
    from pyspark.sql import Window

    out = []
    for p in probes:
        cand = None
        for bc in bcs:
            part = probe.mapInPandas(make_scan(bc, p), "q_id long, n_id long")
            cand = part if cand is None else cand.unionAll(part)
        scored = cand.join(qv, "q_id").join(nv, "n_id").select(
            F.col("q_id").alias("vec_id"),
            F.col("n_id").alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id")
        )
        out.append(
            (
                p,
                scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= _TOPK)
                .select("vec_id", "neighbor_id", "cos_sim", "rank"),
            )
        )
    return out


# ---------------------------------------------------------------------------
# Hybrid exact top-k: numpy candidate generation + Spark exact re-scoring.
# Same oracle as ann_topk_bruteforce — the result is IDENTICAL, only the
# physical strategy changes (this is the block-wise 100 TB shape).
# ---------------------------------------------------------------------------

_MARGIN = 2e-6  # > 2 * max rounding perturbation (round-6 moves < 5e-7)


@register(
    "ann_topk_bruteforce_hybrid",
    oracle=f"""
    WITH normed AS (
      SELECT vec_id, embedding, sqrt({_norm2_duck('embedding')}) AS nrm
      FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
             round({_dot_duck('a.embedding', 'b.embedding')} / a.nrm / b.nrm, 6)
               AS cos_sim
      FROM normed a JOIN normed b ON a.vec_id <> b.vec_id
    )
    SELECT vec_id, neighbor_id, cos_sim, rank FROM (
      SELECT vec_id, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM pairs
    ) WHERE rank <= {_TOPK}
    """,
    description=f"Exact cosine top-{_TOPK}, hybrid strategy: an Arrow-batched "
    "numpy kernel computes all cosines with the SAME sequential-fold "
    "operation order as the SQL expression (one accumulation step per "
    "dimension, vectorized across pairs — bit-identical doubles) and emits "
    f"a per-query candidate set with a {_MARGIN} raw-cosine margin below "
    f"the {_TOPK}th best (rounding moves values < 5e-7, so the exact "
    "rounded top-k is provably inside); Spark then re-scores candidates "
    "with the codegen expression and ranks. Same oracle as "
    "ann_topk_bruteforce — identical result, block-wise physical plan "
    "(probe blocks x broadcast corpus block at 100 TB).",
    tags=("similarity", "ann", "hybrid", "llm-pipeline"),
    bench=True,
)
def ann_topk_bruteforce_hybrid(spark, sf_dir):
    import pandas as pd

    e = T(spark, sf_dir, "embeddings")

    _PROBE_BLOCK = 1024  # rows of Q per inner block
    _CORPUS_BLOCK = 4096  # rows of C per inner block

    def make_gen(bc):
        def gen_candidates(batches):
            # Double-blocked scan: temporaries are bounded by
            # PROBE_BLOCK x CORPUS_BLOCK doubles (~32 MB) regardless of
            # corpus size — the shape that survives a 100x corpus. Per probe
            # block, every corpus CHUNK's candidates are a superset of the
            # global top-k members inside that chunk: the chunk-local kth
            # best cosine is <= the global kth best, so the (kth - margin)
            # cut can only keep MORE than the global cut would; Spark's
            # exact re-scoring then ranks the union.
            import numpy as np

            ids, C, nb = bc.value
            for pdf in batches:
                all_q_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
                all_Q = np.array(
                    [np.asarray(v, dtype=np.float32) for v in pdf["embedding"]]
                ).astype(np.float64)
                if len(all_Q) == 0:
                    continue
                out_q, out_n = [], []
                for p0 in range(0, len(all_Q), _PROBE_BLOCK):
                    Q = all_Q[p0 : p0 + _PROBE_BLOCK]
                    q_ids = all_q_ids[p0 : p0 + _PROBE_BLOCK]
                    q_norm2 = np.zeros(len(Q))
                    for d_i in range(Q.shape[1]):
                        q_norm2 += Q[:, d_i] * Q[:, d_i]
                    q_nrm = np.sqrt(q_norm2)
                    cos_blocks = []
                    for c0 in range(0, len(C), _CORPUS_BLOCK):
                        Cb = C[c0 : c0 + _CORPUS_BLOCK]
                        # acc_d+1 = acc_d + Q[:,d] * Cb[:,d] — the left-fold
                        # order of the unrolled SQL expression, vectorized.
                        acc = np.zeros((len(Q), len(Cb)))
                        for d_i in range(Q.shape[1]):
                            acc += Q[:, d_i : d_i + 1] * Cb[:, d_i][None, :]
                        cos_blocks.append(
                            (acc / q_nrm[:, None])
                            / nb[c0 : c0 + _CORPUS_BLOCK][None, :]
                        )
                    cos = np.concatenate(cos_blocks, axis=1)
                    for i in range(len(Q)):
                        row = cos[i]
                        mask = ids != q_ids[i]
                        vals = row[mask]
                        nbr = ids[mask]
                        if len(vals) == 0:
                            continue
                        k = min(_TOPK, len(vals))
                        kth = np.partition(vals, -k)[-k]
                        keep = vals >= (kth - _MARGIN)
                        out_q.extend([q_ids[i]] * int(keep.sum()))
                        out_n.extend(nbr[keep].tolist())
                yield pd.DataFrame({"vec_id": out_q, "neighbor_id": out_n})

        return gen_candidates

    probe = spread(e.select("vec_id", "embedding"), spark, by="vec_id")
    cand = None
    for bc in _corpus_chunk_broadcasts(spark, e):
        part = probe.mapInPandas(make_gen(bc), "vec_id long, neighbor_id long")
        cand = part if cand is None else cand.unionAll(part)
    # Exact re-scoring of the tiny candidate set with the oracle-order
    # codegen expression, then the final rounded ranking.
    normed = e.select(
        "vec_id",
        "embedding",
        F.expr(f"sqrt({_norm2_spark('embedding')})").alias("nrm"),
    )
    qa = normed.select(
        F.col("vec_id").alias("vec_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    nb_ = normed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("n_emb"),
        F.col("nrm").alias("n_nrm"),
    )
    # Plain hash joins here, NOT F.broadcast(qa/nb_): both sides are the
    # full embeddings table, so a forced broadcast would collect the whole
    # corpus onto the driver at scale (VERDICT r2 #7). AQE still broadcasts
    # when the table turns out small — same plan at gate SFs, no OOM cliff
    # on a 100x corpus.
    scored = (
        cand.join(qa, "vec_id")
        .join(nb_, "neighbor_id")
        .select(
            "vec_id",
            "neighbor_id",
            F.round(
                F.expr(_dot_spark("q_emb", "n_emb"))
                / F.col("q_nrm")
                / F.col("n_nrm"),
                6,
            ).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOPK)
        .select("vec_id", "neighbor_id", "cos_sim", "rank")
    )


# ---------------------------------------------------------------------------
# Hybrid near-dup: the blocked numpy kernel generates threshold candidates
# (margin-guarded), Spark re-scores exactly. Same oracle as
# embedding_near_dup — identical result, scales like the hybrid top-k.
# ---------------------------------------------------------------------------


@register(
    "embedding_near_dup_hybrid",
    oracle=f"""
    WITH normed AS (
      SELECT vec_id, embedding, label, sqrt({_norm2_duck('embedding')}) AS nrm
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           a.label AS label_a, b.label AS label_b,
           round({_dot_duck('a.embedding', 'b.embedding')} / a.nrm / b.nrm, 6)
             AS cos_sim
    FROM normed a JOIN normed b ON a.vec_id < b.vec_id
    WHERE round({_dot_duck('a.embedding', 'b.embedding')} / a.nrm / b.nrm, 6)
          >= {_NEAR_DUP_MIN}
    """,
    description=f"Embedding near-duplicate pairs (cosine >= {_NEAR_DUP_MIN}) "
    "by the hybrid strategy: the double-blocked numpy kernel (sequential "
    f"per-dimension accumulation, bit-identical doubles) emits pairs above "
    f"{_NEAR_DUP_MIN} - 2e-6 and Spark re-scores them with the codegen "
    "expression for the exact rounded threshold — identical result to "
    "embedding_near_dup, block-wise cost.",
    tags=("similarity", "dedup", "hybrid", "llm-pipeline"),
)
def embedding_near_dup_hybrid(spark, sf_dir):
    import pandas as pd

    e = T(spark, sf_dir, "embeddings")
    cut = _NEAR_DUP_MIN - _MARGIN

    def make_gen(bc):
        def gen_pairs(batches):
            # Fixed-threshold cut: chunking the corpus is trivially safe —
            # each chunk emits exactly the pairs above the margin-guarded
            # threshold against its own slice; the union over chunks is the
            # same candidate set the single-broadcast kernel produced.
            import numpy as np

            ids, C, nb = bc.value
            for pdf in batches:
                all_q_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
                all_Q = np.array(
                    [np.asarray(v, dtype=np.float32) for v in pdf["embedding"]]
                ).astype(np.float64)
                if len(all_Q) == 0:
                    continue
                out_a, out_b = [], []
                for p0 in range(0, len(all_Q), 1024):
                    Q = all_Q[p0 : p0 + 1024]
                    q_ids = all_q_ids[p0 : p0 + 1024]
                    q_norm2 = np.zeros(len(Q))
                    for d_i in range(Q.shape[1]):
                        q_norm2 += Q[:, d_i] * Q[:, d_i]
                    q_nrm = np.sqrt(q_norm2)
                    for c0 in range(0, len(C), 4096):
                        Cb = C[c0 : c0 + 4096]
                        acc = np.zeros((len(Q), len(Cb)))
                        for d_i in range(Q.shape[1]):
                            acc += Q[:, d_i : d_i + 1] * Cb[:, d_i][None, :]
                        cos = (acc / q_nrm[:, None]) / nb[c0 : c0 + 4096][None, :]
                        ids_b = ids[c0 : c0 + 4096]
                        # a.vec_id < b.vec_id ordering + threshold with margin
                        hit_q, hit_c = np.nonzero(
                            (cos >= cut) & (q_ids[:, None] < ids_b[None, :])
                        )
                        out_a.extend(q_ids[hit_q].tolist())
                        out_b.extend(ids_b[hit_c].tolist())
                yield pd.DataFrame({"vec_a": out_a, "vec_b": out_b})

        return gen_pairs

    probe = spread(e.select("vec_id", "embedding"), spark, by="vec_id")
    cand = None
    for bc in _corpus_chunk_broadcasts(spark, e):
        part = probe.mapInPandas(make_gen(bc), "vec_a long, vec_b long")
        cand = part if cand is None else cand.unionAll(part)
    normed = e.select(
        "vec_id",
        "embedding",
        "label",
        F.expr(f"sqrt({_norm2_spark('embedding')})").alias("nrm"),
    )
    a = normed.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("a_emb"),
        F.col("label").alias("label_a"),
        F.col("nrm").alias("a_nrm"),
    )
    b = normed.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("b_emb"),
        F.col("label").alias("label_b"),
        F.col("nrm").alias("b_nrm"),
    )
    cos = F.round(
        F.expr(_dot_spark("a_emb", "b_emb")) / F.col("a_nrm") / F.col("b_nrm"),
        6,
    )
    # Plain hash joins — the re-score sides are the full embeddings table;
    # AQE broadcasts when small (see ann_topk_bruteforce_hybrid's re-rank).
    return (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .select(
            "vec_a", "vec_b", "label_a", "label_b", cos.alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= _NEAR_DUP_MIN)
    )

