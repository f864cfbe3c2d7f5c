"""Multimodal plumbing tests: the Arrow/mapInPandas path is real; only the
codec is stubbed."""

from __future__ import annotations

import hashlib

import pytest

from datalakes_and_data_integration_spark.operators.multimodal import (
    attach_payload,
    decode_image,
    extract_features,
)


def test_decode_stub_is_gated():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG....")
    assert decode_image(b"x" * 100, fake=True) == (100, 700 % 480)


def test_extract_features_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "hello"), (2, "héllo wörld")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in extract_features(attach_payload(df)).collect()}
    assert out[1].n_bytes == 5
    assert out[1].payload_md5 == hashlib.md5(b"hello").hexdigest()
    # UTF-8 multibyte: é/ö are 2 bytes each
    assert out[2].n_bytes == len("héllo wörld".encode())
    assert out[2].fake_width == out[2].n_bytes % 640
