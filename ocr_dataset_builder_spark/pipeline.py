"""End-to-end extraction pipeline (SURVEY.md §7.1 minimum slice, grown).

documents (nested, contract shape)
  -> posexplode (S1)
  -> route: media spans -> OCR stage (U1, Arrow-batched) -> cleanup (T1)
            text  spans -> cleanup (T1)
  -> W4 sequencing
  -> W6 ordered span reassembly
  -> parquet/Iceberg sink + lineage commit, anti-join resume (J5).

Every stage is declarative DataFrame API; the only Python boundary is the
vectorized OCR batch function, placed AFTER the cheap relational filters so
Catalyst never has to push predicates through an opaque UDF (SURVEY.md §4
note 1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.cleanup import clean_ocr_col
from .lineage import commit_run, pending_docs, read_checkpoint
from .operators.ocr import ocr_spans
from .synth import explode_spans  # noqa: F401 (public re-export; used by bench)

SPAN_COLS = ["doc_id", "span_pos", "kind", "text", "media_ref", "span_offset"]


def extract_spans(nested: DataFrame, use_arrow_ocr: bool = True) -> DataFrame:
    """Flagship transformation: ordered, cleaned span rows per document.

    Output: (doc_id, ord, kind, text, media_ref, span_offset) where text is
    the cleaned OCR text for media spans and the cleaned raw text for text
    spans. `ord` is the 0-based position in the document's span sequence —
    the invariant key (kind, text, media_ref, order).
    """
    # Document order is INTRA-ROW in the contract shape (spans live in one
    # array per doc), so ordering is embarrassingly parallel: sort each
    # row's array by (offset, ...) with array_sort — a per-row JVM kernel —
    # and posexplode's position IS the ordinal. The whole flagship plan
    # then contains ZERO exchanges (the earlier window variant needed one
    # shuffle on doc_id; verified via explain("formatted")).
    sorted_nested = nested.select(
        "doc_id",
        F.array_sort(
            F.transform(
                "spans",
                lambda s: F.struct(
                    s["offset"].alias("offset"),
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                ),
            )
        ).alias("spans"),
    )
    seq = sorted_nested.select(
        "doc_id", F.posexplode("spans").alias("ord", "span")
    ).select(
        "doc_id",
        F.col("ord").cast("int").alias("ord"),
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("span_offset"),
    )
    # Route only MEDIA rows (and only their narrow columns — no text
    # payload) through the Python/Arrow boundary: the identity crossing
    # itself is the scaling bottleneck in this environment (measured: an
    # identity mapInArrow over 18M rows runs ~6s at 4 cores and ~5s at 16),
    # so bytes-through-Python is the resource to minimize. With ordering
    # now intra-row there is no window after the union, so the split costs
    # no shuffle, and nested-schema pruning keeps the media branch from
    # reading the text bytes at the scan.
    out_cols = ["doc_id", "ord", "kind", "text", "media_ref", "span_offset"]
    media = seq.where(F.col("kind") == "media").drop("text")
    media_ocr = ocr_spans(media, use_arrow=use_arrow_ocr).select(
        "doc_id",
        "ord",
        "kind",
        clean_ocr_col(F.col("ocr_text")).alias("text"),
        "media_ref",
        "span_offset",
    )
    text_clean = seq.where(F.col("kind") == "text").select(
        "doc_id",
        "ord",
        "kind",
        clean_ocr_col(F.col("text")).alias("text"),
        "media_ref",
        "span_offset",
    )
    return media_ocr.select(*out_cols).unionByName(text_clean.select(*out_cols))


def doc_metrics(extracted: DataFrame) -> DataFrame:
    """Per-doc lineage metrics: frames processed, OCR chars, dedup ratio
    (here: fraction of spans whose text equals the previous span's text —
    the same lag-compare the F:i encoder uses)."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("ord")
    with_dup = extracted.withColumn(
        "_is_dup", (F.col("text") == F.lag("text").over(w)).cast("int")
    )
    return with_dup.groupBy("doc_id").agg(
        F.sum(F.when(F.col("kind") == "media", 1).otherwise(0)).alias(
            "frames_processed"
        ),
        F.sum(F.length("text")).alias("ocr_chars"),
        (F.sum(F.coalesce(F.col("_is_dup"), F.lit(0))) / F.count("*")).alias(
            "dedup_ratio"
        ),
    )


def run_extraction(
    spark: SparkSession,
    nested: DataFrame,
    output_dir: str,
    run_id: str = "run0",
    use_arrow_ocr: bool = True,
) -> int:
    """Resumable batch run: anti-join completed docs, extract, write data +
    lineage. Returns number of docs processed this run."""
    ck = read_checkpoint(spark, output_dir)
    pending = pending_docs(nested, ck)
    extracted = extract_spans(pending, use_arrow_ocr=use_arrow_ocr)

    extracted.write.mode("append").parquet(os.path.join(output_dir, "extracted"))

    metrics = doc_metrics(
        spark.read.parquet(os.path.join(output_dir, "extracted")).join(
            pending.select("doc_id"), "doc_id", "left_semi"
        )
    )
    n = metrics.count()
    if n:
        commit_run(spark, output_dir, run_id, metrics)
    return n
