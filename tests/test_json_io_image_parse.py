"""S8-S11/S15 JSON round trips and the T5 image-response parser."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from ocr_dataset_builder_spark.operators.image_parse import (
    SAME_AS_PREVIOUS,
    build_image_response,
    parse_image_response,
)
from ocr_dataset_builder_spark.sources import json_io


def test_image_parse_roundtrip():
    tasks = {
        1: [(0, "raw zero"), (1, "raw one"), (3, "raw three")],  # gap at 2
        2: [(0, "aug zero"), (1, SAME_AS_PREVIOUS), (2, SAME_AS_PREVIOUS)],
        3: [(0, SAME_AS_PREVIOUS), (1, "clean one")],  # invalid at frame 0
        4: [(0, "## md")],
    }
    resp = build_image_response(tasks, "the summary")
    parsed = parse_image_response(resp)
    assert parsed["task1_raw_ocr"] == ["raw zero", "raw one", "", "raw three"]
    # chain collapses to frame 0's resolved value
    assert parsed["task2_augmented"] == ["aug zero", "aug zero", "aug zero"]
    # placeholder at frame 0 -> ''
    assert parsed["task3_cleaned"] == ["", "clean one"]
    assert parsed["task4_markdown"] == ["## md"]
    assert parsed["task5_summary"] == "the summary"


def test_image_parse_edges():
    assert parse_image_response("") is None
    p = parse_image_response("no task headers at all")
    assert p["task1_raw_ocr"] == [] and p["task5_summary"] == ""


def test_tesseract_json_roundtrip(spark):
    rows = [
        ("a", "frame_000000.jpg", "t0"),
        ("a", "frame_000010.jpg", "t10"),
        ("b", "frame_000002.jpg", "x"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, frame_name string, ocr_text string")
    d = tempfile.mkdtemp(prefix="odb_tjson_")
    try:
        json_io.write_tesseract_json(df, f"{d}/tess")
        back = json_io.read_tesseract_json(spark, f"{d}/tess")
        got = sorted(
            (r["doc_id"], r["frame_name"], r["ocr_text"], r["frame_no"])
            for r in back.collect()
        )
        assert got == [
            ("a", "frame_000000.jpg", "t0", 0),
            ("a", "frame_000010.jpg", "t10", 10),
            ("b", "frame_000002.jpg", "x", 2),
        ]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_llm_batches_and_recursive_cost_scan(spark):
    rows = [
        ("a", 0, ["c0", "c1"], ["m0", "m1"], "s0", (0.5,)),
        ("a", 1, ["c2"], ["m2"], "s1", (0.25,)),
        ("b", 0, ["z"], ["y"], "sb", (1.0,)),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, batch_id int, task3_cleaned_text array<string>, "
        "task4_markdown_text array<string>, task5_summary string, "
        "processing_stats struct<estimated_cost_usd double>",
    )
    d = tempfile.mkdtemp(prefix="odb_ljson_")
    try:
        # write into nested subdirs to exercise recursive lookup
        json_io.write_llm_batches(df.where("doc_id = 'a'"), f"{d}/root/sub1")
        json_io.write_llm_batches(df.where("doc_id = 'b'"), f"{d}/root/sub2/deeper")
        back = json_io.read_llm_batches(spark, f"{d}/root/sub1")
        assert back.count() == 2
        assert back.collect()[0]["task3_cleaned_text"] == ["c0", "c1"]

        costs = json_io.scan_costs_recursive(spark, f"{d}/root")
        stats = json_io.cost_stats(costs).collect()[0]
        assert abs(stats["total_cost"] - 1.75) < 1e-9
        assert abs(stats["max_cost"] - 1.0) < 1e-9
        assert costs.count() == 3
    finally:
        shutil.rmtree(d, ignore_errors=True)
