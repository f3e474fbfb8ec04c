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


# ---------------------------------------------------------------------------
# F3 — resize arithmetic (reference video/processing.py:163-185)
# ---------------------------------------------------------------------------
#
# The pixel resampling itself needs cv2 (absent here), but the *decision*
# the reference makes — output dims and interpolation mode — is pure
# arithmetic and is what downstream stages consume. Expressed as JVM
# columns so it is oracle-checkable end to end:
#   if max_dim > 0 and max(h, w) > max_dim:
#       scale = max_dim / max(h, w)
#       out   = (int(w * scale), int(h * scale))   # int() truncates
#       mode  = INTER_AREA if scale < 1.0 else INTER_LINEAR
#   else: unchanged, mode NULL (no resize)

INTER_AREA = "INTER_AREA"
INTER_LINEAR = "INTER_LINEAR"


def resize_dims(
    h: F.Column, w: F.Column, max_dimension: int
) -> tuple[F.Column, F.Column, F.Column]:
    """Returns (out_h, out_w, interpolation) columns."""
    cur_max = F.greatest(h, w).cast("double")
    needs = (F.lit(max_dimension) > 0) & (cur_max > max_dimension)
    scale = F.lit(float(max_dimension)) / cur_max
    out_h = F.when(needs, F.floor(h.cast("double") * scale).cast("int")).otherwise(
        h.cast("int")
    )
    out_w = F.when(needs, F.floor(w.cast("double") * scale).cast("int")).otherwise(
        w.cast("int")
    )
    interp = F.when(
        needs,
        F.when(scale < 1.0, F.lit(INTER_AREA)).otherwise(F.lit(INTER_LINEAR)),
    ).otherwise(F.lit(None).cast("string"))
    return out_h, out_w, interp


def resize_dims_sql(h: str, w: str, max_dimension: int) -> tuple[str, str, str]:
    """DuckDB twins of resize_dims (same double arithmetic, floor not
    CAST — DuckDB CAST(double AS INT) rounds while int() truncates)."""
    cur = f"CAST(greatest({h}, {w}) AS DOUBLE)"
    needs = f"({max_dimension} > 0 AND {cur} > {max_dimension})"
    scale = f"({float(max_dimension)} / {cur})"
    out_h = (
        f"CASE WHEN {needs} THEN CAST(floor(CAST({h} AS DOUBLE) * {scale}) AS INT)"
        f" ELSE CAST({h} AS INT) END"
    )
    out_w = (
        f"CASE WHEN {needs} THEN CAST(floor(CAST({w} AS DOUBLE) * {scale}) AS INT)"
        f" ELSE CAST({w} AS INT) END"
    )
    interp = (
        f"CASE WHEN {needs} THEN "
        f"(CASE WHEN {scale} < 1.0 THEN '{INTER_AREA}' ELSE '{INTER_LINEAR}' END) "
        f"ELSE NULL END"
    )
    return out_h, out_w, interp


def resize_pixels(*_args, **_kwargs):
    """The actual resampling — cv2-only, stubbed in this container."""
    raise NotImplementedError(
        "pixel resampling requires cv2.resize; resize_dims computes the "
        "dims + interpolation-mode decision (the oracle-checked part)"
    )
