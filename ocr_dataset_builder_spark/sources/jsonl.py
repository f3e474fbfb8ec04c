"""S12 — JSONL dataset export (reference data/extract_text_dataset.py:92-138).

Two modes:

* ``standard``: one record per frame with the coalesced fields
  (frame_path, tesseract_ocr, llm_clean_ocr, markdown, summary, metadata).
* ``cleaning_pairs``: 3 records per frame — (raw, clean) pairs from
  tesseract + two augmented variants
  (docs/TEXT_DATASET_EXTRACTION_GUIDE.md:38-55).

Spark-native: ``df.write.json`` — one JSON object per line, written in
parallel, no driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# field set per reference extract_text_dataset.py:104-111 (standard mode)
STANDARD_COLS = [
    "frame_path",
    "tesseract_ocr",
    "llm_clean_ocr",
    "augmented_llm_clean_ocr",
    "markdown",
    "summary",
]


def export_standard(df: DataFrame, path: str) -> None:
    """``standard`` mode: select the canonical per-frame fields."""
    cols = [c for c in STANDARD_COLS if c in df.columns]
    df.select("doc_id", *cols).write.mode("overwrite").json(path)


def export_cleaning_pairs(
    df: DataFrame,
    path: str,
    raw_cols: list[str],
    clean_col: str,
) -> None:
    """``cleaning_pairs`` mode: explode each frame into (raw, clean) pairs,
    one per raw variant — the F12 3-way expansion as a single
    explode(array(struct...)), no per-variant passes."""
    variants = F.array(
        *[
            F.struct(
                F.lit(i).alias("variant_id"),
                F.col(c).alias("raw"),
                F.col(clean_col).alias("clean"),
            )
            for i, c in enumerate(raw_cols)
        ]
    )
    out = df.select(
        "doc_id",
        F.col("frame_path") if "frame_path" in df.columns else F.lit(None).alias("frame_path"),
        F.explode(variants).alias("p"),
    ).select(
        "doc_id",
        "frame_path",
        F.col("p.variant_id").alias("variant_id"),
        F.col("p.raw").alias("raw"),
        F.col("p.clean").alias("clean"),
    )
    out.where(F.col("raw").isNotNull()).write.mode("overwrite").json(path)
