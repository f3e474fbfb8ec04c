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


def _area_weights(n_in: int, n_out: int):
    """Coverage-weight matrix W (n_out x n_in) for 1-D area resampling:
    W[o, i] = |overlap([i, i+1], [o*s, (o+1)*s])| with s = n_in/n_out.
    Rows sum to s, so (W @ v) / s is the area-weighted mean."""
    import numpy as np

    s = n_in / n_out
    w = np.zeros((n_out, n_in))
    for o in range(n_out):
        lo, hi = o * s, (o + 1) * s
        i0, i1 = int(np.floor(lo)), int(np.ceil(hi))
        for i in range(i0, min(i1, n_in)):
            w[o, i] = min(hi, i + 1) - max(lo, i)
    return w


def _linear_weights(n_in: int, n_out: int):
    """Bilinear weight matrix with half-pixel centers (the standard
    src = (dst + 0.5) * s - 0.5 mapping, edge-clamped): two nonzero
    entries per output row summing to 1."""
    import numpy as np

    s = n_in / n_out
    w = np.zeros((n_out, n_in))
    for o in range(n_out):
        src = (o + 0.5) * s - 0.5
        i0 = int(np.floor(src))
        frac = src - i0
        a = max(0, min(i0, n_in - 1))
        b = max(0, min(i0 + 1, n_in - 1))
        w[o, a] += 1.0 - frac
        w[o, b] += frac
    return w


def resize_pixels(img, out_h: int, out_w: int, mode: str):
    """Pure-numpy single-channel resampling implementing the textbook
    formulas behind the reference's two interpolation modes
    (video/processing.py:163-185 picks cv2.INTER_AREA for downscale,
    cv2.INTER_LINEAR otherwise):

    * INTER_AREA — exact area-weighted average: output pixel = mean of
      the source region it covers, fractional edge coverage included.
      For an integer downscale factor this reduces to the exact block
      mean (the property the oracle checks).
    * INTER_LINEAR — bilinear with half-pixel centers and edge clamp.

    Both are separable, so the 2-D resample is the weight-matrix product
    Wy @ img @ Wx.T (vectorized, no Python pixel loop on the hot path —
    the weight matrices are built once per (in, out) shape). Output is
    rounded half-up to uint8, matching the engine-portable integer
    arithmetic the oracle uses. This is a faithful reimplementation of
    the documented resampling definitions, not a byte clone of cv2's
    fixed-point internals (cv2 is absent here by design)."""
    import numpy as np

    img = np.asarray(img, dtype=np.float64)
    in_h, in_w = img.shape
    if mode == INTER_AREA:
        wy = _area_weights(in_h, out_h)
        wx = _area_weights(in_w, out_w)
        out = (wy @ img @ wx.T) / ((in_h / out_h) * (in_w / out_w))
    elif mode == INTER_LINEAR:
        wy = _linear_weights(in_h, out_h)
        wx = _linear_weights(in_w, out_w)
        out = wy @ img @ wx.T
    else:
        raise ValueError(f"unknown interpolation mode: {mode!r}")
    return np.floor(out + 0.5).clip(0, 255).astype(np.uint8)
