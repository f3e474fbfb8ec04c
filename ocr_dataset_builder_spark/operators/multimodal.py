"""Multimodal binary-column plumbing (build-brief requirement).

Media payloads are opaque ``binary`` columns with typed metadata. The
decode / feature-extract step runs as ``mapInPandas`` over Arrow batches —
exactly where cv2/PIL/ffmpeg would operate per batch. Those libs aren't in
this container, so the *decode* is a clearly-marked deterministic stand-in
(md5 + byte length of the payload); the Spark-side plumbing — binary
schema, batch shape, partitioning — is real and oracle-checked.

Reference analogue: raw frame bytes + MIME handling in
llm/image_processing.py:132-152.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)


def with_payload(media: DataFrame) -> DataFrame:
    """Attach the synthetic binary payload (deterministic bytes derived
    from doc_id/media_ref — stands in for the stored frame image)."""
    return media.withColumn(
        "payload",
        F.encode(F.concat(F.col("doc_id"), F.lit("/"), F.col("media_ref")), "utf-8"),
    )


def decode_features(media_with_payload: DataFrame) -> DataFrame:
    """The batched 'decode' stage. A real implementation would do
    image decode / resize / feature extraction here (reference
    video/processing.py:163-185 resize, tesseract/processing.py OCR);
    the container has no image libs, so features = (n_bytes, md5)."""
    in_fields = [f for f in media_with_payload.schema.fields]
    schema = StructType(
        in_fields
        + [
            StructField("n_bytes", IntegerType()),
            StructField("payload_md5", StringType()),
        ]
    )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            payloads = pdf["payload"]
            # <-- real decode (cv2.imdecode / PIL.Image.open) would be here,
            # batch-wise; raise NotImplementedError if real decode requested
            pdf["n_bytes"] = [len(b) for b in payloads]
            pdf["payload_md5"] = [hashlib.md5(bytes(b)).hexdigest() for b in payloads]
            yield pdf

    return media_with_payload.mapInPandas(_run, schema=schema)


def decode_image(*_args, **_kwargs):
    """Real image decode is not available in this container."""
    raise NotImplementedError(
        "image decode requires cv2/PIL, not present in this environment; "
        "decode_features provides the deterministic stand-in"
    )
