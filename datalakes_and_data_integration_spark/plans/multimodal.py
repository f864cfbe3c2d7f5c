"""Multimodal query: binary-payload feature extraction through the real
mapInPandas plumbing (operators/multimodal.py), oracle-checked because the
stubbed decode is deterministic and SQL-expressible."""

from __future__ import annotations

from datalakes_and_data_integration_spark.operators.multimodal import (
    attach_payload,
    extract_features,
)
from datalakes_and_data_integration_spark.plans._util import T
from datalakes_and_data_integration_spark.plans.registry import register


@register(
    "multimodal_feature_extract",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5,
           octet_length(encode(text)) % 640 AS fake_width,
           (octet_length(encode(text)) * 7) % 480 AS fake_height
    FROM documents
    """,
    description="Binary media payload -> Arrow-batched mapInPandas feature "
    "extraction (byte length, digest, stubbed decode dims). The pandas UDF "
    "plumbing is real; only the codec is a deterministic fake.",
    tags=("multimodal", "pandas-udf", "llm-pipeline"),
)
def multimodal_feature_extract(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return extract_features(attach_payload(d))


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id, frame_idx, frame_offset,
           md5(substring(text, frame_offset + 1, 32)) AS frame_md5
    FROM (
      SELECT doc_id, text, i AS frame_idx,
             CAST(i * (length(text) // 3) AS BIGINT) AS frame_offset
      FROM documents, unnest([0, 1, 2]) AS t(i)
    )
    """,
    description="Stubbed video frame sampling: 3 evenly spaced fixed-length "
    "payload slices per document through row-expanding mapInPandas (each "
    "input row yields 3 output rows, partition-local).",
    tags=("multimodal", "pandas-udf", "llm-pipeline"),
)
def multimodal_frame_sample(spark, sf_dir):
    from datalakes_and_data_integration_spark.operators.multimodal import (
        sample_frames,
    )

    d = T(spark, sf_dir, "documents")
    return sample_frames(attach_payload(d))


@register(
    "multimodal_audio_features",
    # Byte-level arithmetic IS DuckDB-expressible: hex() the payload blob,
    # decode each byte from its two hex digits via strpos against
    # '0123456789ABCDEF', and aggregate. Integer sums/counts are exact and
    # each output is one correctly-rounded double division, so the oracle
    # matches the pandas arithmetic bit-for-bit.
    oracle="""
    WITH pay AS (
      SELECT doc_id, hex(encode(text)) AS h,
             octet_length(encode(text)) AS n
      FROM documents
    ),
    pos AS (
      SELECT doc_id, h, unnest(range(1, n + 1)) AS i FROM pay
    ),
    bytes AS (
      SELECT doc_id,
             (strpos('0123456789ABCDEF', substr(h, 2*i - 1, 1)) - 1) * 16
             + (strpos('0123456789ABCDEF', substr(h, 2*i, 1)) - 1) AS b
      FROM pos
    ),
    agg AS (
      SELECT doc_id, CAST(sum(b) AS BIGINT) AS sb,
             CAST(max(b) AS BIGINT) AS mx, count(*) AS nb
      FROM bytes GROUP BY doc_id
    )
    SELECT p.doc_id,
           CAST(p.n AS DOUBLE) / 16000 AS duration_s,
           coalesce(CAST(a.sb AS DOUBLE) / a.nb, 0.0) AS mean_level,
           coalesce(a.mx, 0) AS peak_level
    FROM pay p LEFT JOIN agg a USING (doc_id)
    """,
    description="Stubbed audio feature extraction (duration, mean/peak "
    "sample level over payload bytes) through mapInPandas; the oracle "
    "replays the byte arithmetic in SQL via hex-digit decoding.",
    tags=("multimodal", "pandas-udf", "llm-pipeline"),
)
def multimodal_audio_features(spark, sf_dir):
    from datalakes_and_data_integration_spark.operators.multimodal import (
        audio_features,
    )

    d = T(spark, sf_dir, "documents")
    return audio_features(attach_payload(d))


@register(
    "multimodal_metadata_stats",
    oracle="""
    SELECT media_type, count(*) AS n_docs,
           CAST(sum(declared_len) AS BIGINT) AS total_bytes,
           CAST(min(declared_len) AS BIGINT) AS min_bytes,
           CAST(max(declared_len) AS BIGINT) AS max_bytes
    FROM (
      SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             ELSE 'video' END AS media_type,
             octet_length(encode(text)) AS declared_len
      FROM documents
    )
    GROUP BY media_type
    """,
    description="Typed media-metadata struct column (media_type, source, "
    "declared_len) attached to binary payloads, then grouped stats over the "
    "struct fields — the metadata side of the multimodal column design "
    "(operators.multimodal.MEDIA_METADATA).",
    tags=("multimodal", "struct", "llm-pipeline"),
)
def multimodal_metadata_stats(spark, sf_dir):
    from pyspark.sql import functions as F

    d = T(spark, sf_dir, "documents")
    with_meta = attach_payload(d).withColumn(
        "media_meta",
        F.struct(
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("media_type"),
            F.col("source").alias("source"),
            F.length("payload").cast("long").alias("declared_len"),
        ),
    )
    return with_meta.groupBy(
        F.col("media_meta.media_type").alias("media_type")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("media_meta.declared_len").alias("total_bytes"),
        F.min("media_meta.declared_len").alias("min_bytes"),
        F.max("media_meta.declared_len").alias("max_bytes"),
    )


# Perceptual-hash near-dup over binary payloads: the multimodal DEDUP
# tier. 20-bit block-mean pHash per payload (operators.multimodal.
# perceptual_hash — integer arithmetic only, so the SQL oracle replays
# it from hex-decoded bytes), then exact hamming <= 2 pairs found via
# 3-band pigeonhole buckets (7/7/6 bits: any pair within hamming 2
# leaves one band untouched) — the same candidates-only shuffle shape as
# the simhash text path, applied to media payloads. A real image pHash
# swaps decoded luma pixels for raw bytes; blocking, thresholding,
# banding, and verification are unchanged.

_PH_BANDS_SQL = [
    ("phash & 127", 0),  # bits 0-6
    ("(phash >> 7) & 127", 1),  # bits 7-13
    ("(phash >> 14) & 63", 2),  # bits 14-19
]


def _phash_oracle() -> str:
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, phash, {i} AS band, CAST({expr} AS BIGINT) AS bv "
        "FROM ph"
        for expr, i in _PH_BANDS_SQL
    )
    return f"""
    WITH pay AS (
      SELECT doc_id, hex(encode(text)) AS h,
             octet_length(encode(text)) AS n
      FROM documents
    ),
    pos AS (
      SELECT doc_id, n, h, unnest(range(1, n + 1)) AS i
      FROM pay WHERE n > 0
    ),
    bytes AS (
      SELECT doc_id, n, ((i - 1) * 20) // n AS blk,
             (strpos('0123456789ABCDEF', substr(h, 2*i - 1, 1)) - 1) * 16
             + (strpos('0123456789ABCDEF', substr(h, 2*i, 1)) - 1) AS b
      FROM pos
    ),
    blocks AS (
      SELECT p.doc_id, p.n, g.blk,
             CAST(coalesce(s.sb, 0) AS BIGINT) AS sb,
             CAST(coalesce(s.nb, 0) AS BIGINT) AS nb
      FROM pay p CROSS JOIN (SELECT unnest(range(20)) AS blk) g
      LEFT JOIN (
        SELECT doc_id, blk, sum(b) AS sb, count(*) AS nb
        FROM bytes GROUP BY doc_id, blk
      ) s ON s.doc_id = p.doc_id AND s.blk = g.blk
      WHERE p.n > 0
    ),
    tot AS (SELECT doc_id, CAST(sum(sb) AS BIGINT) AS total FROM blocks GROUP BY doc_id),
    ph AS (
      SELECT b.doc_id,
             CAST(sum(CASE WHEN b.sb * b.n > t.total * b.nb
                           THEN 1 << b.blk ELSE 0 END) AS BIGINT) AS phash
      FROM blocks b JOIN tot t USING (doc_id)
      GROUP BY b.doc_id
    ),
    bands AS ({band_rows}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, a.phash AS ph_a,
                      b.doc_id AS doc_b, b.phash AS ph_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(ph_a, ph_b)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(ph_a, ph_b)) <= 2
    """


@register(
    "multimodal_phash_neardup",
    oracle=_phash_oracle(),
    description="Perceptual-hash near-dup over binary payloads: 16-bit "
    "block-mean pHash per payload via Arrow-batched mapInPandas (integer "
    "arithmetic only — block mean vs global mean by cross-multiplication), "
    "exact hamming<=2 pairs via 3-band (7/7/6-bit) pigeonhole buckets "
    "with bit_count verification of candidates only. The multimodal dedup "
    "tier: swap raw bytes for decoded luma and the same pipeline is image "
    "near-dup at 100 TB (candidates shuffle, never payloads).",
    tags=("multimodal", "dedup", "pandas-udf", "phash", "llm-pipeline"),
)
def multimodal_phash_neardup(spark, sf_dir):
    from pyspark.sql import functions as F

    from datalakes_and_data_integration_spark.operators.multimodal import (
        perceptual_hash,
    )
    from datalakes_and_data_integration_spark.plans._util import spread

    d = spread(T(spark, sf_dir, "documents"), spark)
    ph = perceptual_hash(attach_payload(d)).select("doc_id", "phash").persist()
    bands = ph.select(
        "doc_id",
        "phash",
        F.posexplode(
            F.array(
                F.expr("phash & 127"),
                F.expr("shiftright(phash, 7) & 127"),
                F.expr("shiftright(phash, 14) & 63"),
            )
        ).alias("band", "bv"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.phash").alias("ph_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.phash").alias("ph_b"),
        )
        .distinct()
    )
    ham = F.expr("bit_count(ph_a ^ ph_b)")
    return cand.select(
        "doc_a", "doc_b", ham.cast("long").alias("hamming")
    ).filter(F.col("hamming") <= 2)
