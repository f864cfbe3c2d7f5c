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
