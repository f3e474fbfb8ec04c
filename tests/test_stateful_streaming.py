"""Cross-micro-batch stateful dedup: state must survive between
availableNow invocations via the state store."""

from __future__ import annotations

import os
import shutil
import tempfile

from ocr_dataset_builder_spark.streaming.stateful import streaming_dedup

SCHEMA = "doc_id string, frame_seq int, text string"


def _run_pass(spark, in_dir, out_dir):
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    q = (
        streaming_dedup(stream)
        .writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "data"))
        .option("checkpointLocation", os.path.join(out_dir, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stateful_dedup_across_batches(spark):
    in_dir = tempfile.mkdtemp(prefix="odb_state_in_")
    out_dir = tempfile.mkdtemp(prefix="odb_state_out_")
    try:
        # batch 1: doc a frames 0..2 (1 is a duplicate of 0)
        b1 = spark.createDataFrame(
            [("a", 0, "x"), ("a", 1, "x"), ("a", 2, "y"), ("b", 0, "m")], SCHEMA
        )
        b1.write.mode("append").parquet(in_dir)
        _run_pass(spark, in_dir, out_dir)

        # batch 2: doc a frame 3 duplicates frame 2's text — the duplicate
        # relationship CROSSES the micro-batch boundary
        b2 = spark.createDataFrame(
            [("a", 3, "y"), ("a", 4, "z"), ("b", 1, "m"), ("b", 2, "n")], SCHEMA
        )
        b2.write.mode("append").parquet(in_dir)
        _run_pass(spark, in_dir, out_dir)

        got = sorted(
            (r["doc_id"], r["frame_seq"], r["text"])
            for r in spark.read.parquet(os.path.join(out_dir, "data")).collect()
        )
        assert got == [
            ("a", 0, "x"),
            ("a", 2, "y"),
            ("a", 4, "z"),  # frame 3 dropped: dup of 2 across batches
            ("b", 0, "m"),
            ("b", 2, "n"),  # frame 1 dropped: dup of 0 across batches
        ]
    finally:
        shutil.rmtree(in_dir, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)


def test_streaming_exact_dedup_within_watermark(spark):
    """dropDuplicatesWithinWatermark-based exact dedup: one survivor per
    content fingerprint within a batch (which row wins inside a single
    micro-batch is engine-chosen), and a re-delivery in a LATER
    micro-batch is always dropped — the fingerprint state survives in
    the store across availableNow restarts."""
    from ocr_dataset_builder_spark.streaming.stateful import (
        streaming_exact_dedup,
    )

    in_dir = tempfile.mkdtemp(prefix="odb_dd_in_")
    out_dir = tempfile.mkdtemp(prefix="odb_dd_out_")
    sch = "doc_id string, text string, ts timestamp"

    def _pass():
        q = (
            streaming_exact_dedup(
                spark.readStream.schema(sch).parquet(in_dir)
            )
            .writeStream.format("parquet")
            .option("path", os.path.join(out_dir, "data"))
            .option("checkpointLocation", os.path.join(out_dir, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        import datetime

        t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)

        def ts(m):
            return t0 + datetime.timedelta(minutes=m)

        spark.createDataFrame(
            [
                ("a", "hello world", ts(0)),
                ("b", "hello world", ts(1)),  # same content, same batch
                ("c", "unique text", ts(2)),
            ],
            sch,
        ).write.mode("append").parquet(in_dir)
        _pass()
        rows = spark.read.parquet(os.path.join(out_dir, "data")).collect()
        by_fp = {}
        for r in rows:
            by_fp.setdefault(r["fp"], []).append(r["doc_id"])
        assert len(by_fp) == 2, by_fp  # two distinct contents
        assert all(len(v) == 1 for v in by_fp.values()), by_fp
        survivors = {v[0] for v in by_fp.values()}
        assert len(survivors & {"a", "b"}) == 1 and "c" in survivors

        # batch 2: re-deliver both contents within the horizon, plus one
        # genuinely new doc — only the new one may pass
        spark.createDataFrame(
            [
                ("d", "hello world", ts(3)),
                ("e", "unique text", ts(4)),
                ("f", "fresh content", ts(5)),
            ],
            sch,
        ).write.mode("append").parquet(in_dir)
        _pass()
        rows2 = spark.read.parquet(os.path.join(out_dir, "data")).collect()
        new_ids = {r["doc_id"] for r in rows2} - {r["doc_id"] for r in rows}
        assert new_ids == {"f"}, new_ids
    finally:
        shutil.rmtree(in_dir, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
