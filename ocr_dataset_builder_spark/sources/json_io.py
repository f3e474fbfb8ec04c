"""JSON scans/sinks — S8/S9/S10/S11/S15 in SURVEY.md §2.1.

* Tesseract per-video JSON (map frame_name -> text): written with
  ``to_json(map_from_entries(...))`` per doc, read back with ``from_json``
  + ``explode`` — the normalized-rows form stays the primary relation.
* LLM batch JSON: one struct row per (doc, batch) with task arrays +
  summary; ``spark.read.json`` with explicit schema + ``input_file_name``
  derived batch ids.
* Recursive cost scan (S15): ``spark.read.option("recursiveFileLookup",
  "true").json(...)`` + select of ``processing_stats.estimated_cost_usd``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

LLM_BATCH_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("batch_id", IntegerType()),
        StructField("task3_cleaned_text", ArrayType(StringType())),
        StructField("task4_markdown_text", ArrayType(StringType())),
        StructField("task5_summary", StringType()),
        StructField(
            "processing_stats",
            StructType([StructField("estimated_cost_usd", DoubleType())]),
        ),
    ]
)


def write_tesseract_json(ocr_rows: DataFrame, path: str) -> None:
    """S8: one row per doc with the {frame_name: text} map serialized as a
    JSON string column (the reference's tesseract_ocr.json shape)."""
    per_doc = ocr_rows.groupBy("doc_id").agg(
        F.to_json(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(F.struct(F.col("frame_name"), F.col("ocr_text")))
                )
            )
        ).alias("ocr_json")
    )
    per_doc.write.mode("overwrite").json(path)


def read_tesseract_json(spark: SparkSession, path: str) -> DataFrame:
    """S9: scan the per-doc JSON back into normalized (doc_id, frame_name,
    ocr_text) rows with numeric frame ordering (T2)."""
    raw = spark.read.json(path)
    entries = raw.select(
        "doc_id",
        F.explode(
            F.from_json(F.col("ocr_json"), "map<string,string>")
        ).alias("frame_name", "ocr_text"),
    )
    return entries.withColumn(
        "frame_no",
        F.regexp_extract("frame_name", r"frame_(\d+)\.", 1).cast("int"),
    )


def write_llm_batches(batch_rows: DataFrame, path: str) -> None:
    """S11: one JSON object per (doc, batch)."""
    batch_rows.write.mode("overwrite").json(path)


def read_llm_batches(spark: SparkSession, path: str) -> DataFrame:
    """S10: sorted batch scan with explicit schema."""
    return spark.read.schema(LLM_BATCH_SCHEMA).json(path).orderBy("doc_id", "batch_id")


def scan_costs_recursive(spark: SparkSession, root: str) -> DataFrame:
    """S15: os.walk for *.json -> recursive file lookup; extract
    estimated_cost_usd (reference llm/utils/calculate_cost_stats.py:11-56)."""
    raw = (
        spark.read.option("recursiveFileLookup", "true")
        .schema(LLM_BATCH_SCHEMA)
        .json(root)
    )
    return raw.select(
        "doc_id",
        "batch_id",
        F.col("processing_stats.estimated_cost_usd").alias("cost_usd"),
    ).where(F.col("cost_usd").isNotNull())


def cost_stats(costs: DataFrame) -> DataFrame:
    """A6: sum/mean/population-sigma/min/max (np.std is population)."""
    return costs.agg(
        F.sum("cost_usd").alias("total_cost"),
        F.avg("cost_usd").alias("mean_cost"),
        F.stddev_pop("cost_usd").alias("std_cost"),
        F.min("cost_usd").alias("min_cost"),
        F.max("cost_usd").alias("max_cost"),
    )
