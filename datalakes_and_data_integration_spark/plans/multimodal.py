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
    # Byte-level signal arithmetic is not reasonably SQL-expressible; the
    # driver records the weaker rows-only check for this one.
    oracle=None,
    description="Stubbed audio feature extraction (duration, mean/peak "
    "sample level over payload bytes) through mapInPandas; no SQL oracle — "
    "rows-only check.",
    tags=("multimodal", "pandas-udf", "llm-pipeline"),
)
def multimodal_audio_features(spark, sf_dir):
    from datalakes_and_data_integration_spark.operators.multimodal import (
        audio_features,
    )

    d = T(spark, sf_dir, "documents")
    return audio_features(attach_payload(d))
