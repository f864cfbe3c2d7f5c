"""Multimodal columns: opaque binary payloads + typed metadata.

Design (BASELINE.json north star): image/audio/video travel as ``binary``
columns with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over ``mapInPandas`` —
the only part of the engine where Python touches row data, because media
codecs don't exist as Spark expressions.

The media codec libraries (PIL, librosa, av) are NOT in this container, so
the actual decode is STUBBED: ``decode_image`` raises NotImplementedError
unless a deterministic fake is requested. Everything around it — schema,
binary handling, Arrow batch shape, partition-parallel execution — is real
and tested (tests/test_multimodal.py), so dropping in a real codec is a
one-function change.

Scale: mapInPandas streams Arrow batches partition-locally — no shuffle, no
driver involvement; 100 TB of media shards across executors exactly like any
other scan. Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (keep payload_bytes *
batch_rows under executor memory).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_METADATA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("declared_len", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("fake_width", T.LongType()),
        T.StructField("fake_height", T.LongType()),
    ]
)


def decode_image(payload: bytes, *, fake: bool = False) -> tuple[int, int]:
    """Decode an image payload -> (width, height).

    Real decode needs PIL/libvips (not installed here); ``fake=True`` derives
    deterministic pseudo-dimensions from the byte length so the pipeline
    around the stub is fully exercisable.
    """
    if fake:
        n = len(payload)
        return (n % 640, (n * 7) % 480)
    try:
        from PIL import Image  # noqa: PLC0415
        import io  # noqa: PLC0415

        with Image.open(io.BytesIO(payload)) as im:
            return im.size
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "real image decode requires PIL; pass fake=True for the "
            "deterministic stub"
        ) from exc


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column (UTF-8 bytes of the text
    here; in production this is the raw media object)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Each pandas batch computes byte length, content digest, and (stubbed)
    decoded dimensions. Runs partition-local — no shuffle.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n_bytes,
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "fake_width": payloads.map(
                        lambda b: decode_image(bytes(b), fake=True)[0]
                    ),
                    "fake_height": payloads.map(
                        lambda b: decode_image(bytes(b), fake=True)[1]
                    ),
                }
            )

    return df.select(id_col, "payload").mapInPandas(_extract, FEATURE_SCHEMA)
