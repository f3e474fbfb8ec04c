"""fx_skew: one doc with 5,000 frames + 200 docs with 5 frames — the
salted two-phase reassembly must produce identical output to the direct
single-phase aggregation, and the flagship pipeline must survive the
skewed group."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_dataset_builder_spark.operators.reassembly import reassemble_nested
from ocr_dataset_builder_spark.pipeline import extract_spans
from ocr_dataset_builder_spark.synth import nest_span_rows


def _skew_flat(spark):
    big = spark.range(5000).select(
        F.lit("big_doc").alias("doc_id"),
        F.col("id").cast("int").alias("span_pos"),
        F.when(F.col("id") % 3 == 0, "media").otherwise("text").alias("kind"),
        F.when(
            F.col("id") % 3 != 0, F.concat(F.lit("text  "), F.col("id").cast("string"))
        ).alias("text"),
        F.when(
            F.col("id") % 3 == 0, F.format_string("frame_%06d.jpg", F.col("id"))
        ).alias("media_ref"),
        F.col("id").cast("int").alias("span_offset"),
    )
    small = spark.range(200 * 5).select(
        F.concat(F.lit("small_"), (F.col("id") / 5).cast("int").cast("string")).alias(
            "doc_id"
        ),
        (F.col("id") % 5).cast("int").alias("span_pos"),
        F.lit("text").alias("kind"),
        F.concat(F.lit("s "), F.col("id").cast("string")).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        (F.col("id") % 5).cast("int").alias("span_offset"),
    )
    return big.unionByName(small)


def test_salted_two_phase_equals_direct(spark):
    flat = _skew_flat(spark)
    direct = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in reassemble_nested(flat, salt_buckets=1).collect()
    }
    salted = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in reassemble_nested(flat, salt_buckets=8).collect()
    }
    assert direct == salted
    assert len(salted["big_doc"]) == 5000
    assert salted["big_doc"][0][3] == 0 and salted["big_doc"][-1][3] == 4999


def test_flagship_on_skewed_corpus(spark):
    nested = nest_span_rows(_skew_flat(spark))
    out = extract_spans(nested)
    per_doc = out.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.max("ord").alias("mx")
    )
    rows = {r["doc_id"]: (r["n"], r["mx"]) for r in per_doc.collect()}
    assert rows["big_doc"] == (5000, 4999)
    assert rows["small_7"] == (5, 4)
    assert len(rows) == 201
