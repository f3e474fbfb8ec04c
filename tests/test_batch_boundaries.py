"""A2 batch boundaries at the reference's real batch size (60 frames per
LLM call, llm/image_pipeline.py:594 / llm/text_pipeline.py:262): docs
with 59/60/61 frames must bucket into 1/1/2 batches, and the
assemble -> refine -> parse round trip must return exactly one parsed
item per input frame at every boundary (the reference's PASS/FAIL
frame-count validation, llm/text_processing.py:379-393)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_dataset_builder_spark.operators.refinement import refine_batches
from ocr_dataset_builder_spark.operators.sequencing import with_batch_id

_FPB = 60


def _frames(spark, sizes):
    rows = [
        (f"d{n}", s, f"text {n}/{s}") for n in sizes for s in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id string, frame_seq int, text string")


def test_batch_bucketing_at_59_60_61(spark):
    df = with_batch_id(_frames(spark, [59, 60, 61]), _FPB)
    got = {
        (r["doc_id"], r["batch_id"]): r["n"]
        for r in df.groupBy("doc_id", "batch_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == {
        ("d59", 0): 59,
        ("d60", 0): 60,
        ("d61", 0): 60,
        ("d61", 1): 1,  # the boundary frame spills into its own batch
    }


def test_refine_roundtrip_preserves_frame_counts_at_boundaries(spark):
    df = with_batch_id(_frames(spark, [59, 60, 61]), _FPB)
    out = refine_batches(df)
    per_doc = {
        r["doc_id"]: r["n"]
        for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_doc == {"d59": 59, "d60": 60, "d61": 61}
    # each parsed row carries its own cleaned text (positional J2 intact)
    rows = out.where("doc_id = 'd61'").orderBy("frame_seq").collect()
    assert [r["frame_seq"] for r in rows] == list(range(61))
    assert all(r["cleaned"] == f"text 61/{r['frame_seq']}" for r in rows)
