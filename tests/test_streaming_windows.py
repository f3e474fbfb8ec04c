"""Watermark semantics: windows emit exactly once when the watermark
passes their end, and events later than the allowance are DROPPED — both
across availableNow restarts (watermark persists in the checkpoint)."""

from __future__ import annotations

import os
import shutil
import tempfile

from ocr_dataset_builder_spark.streaming.windows import windowed_event_counts

SCHEMA = "event_id bigint, user_id string, ts timestamp, value double"


def _run_pass(spark, in_dir, out_dir):
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    q = (
        windowed_event_counts(stream)
        .writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "data"))
        .option("checkpointLocation", os.path.join(out_dir, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _rows(spark, out_dir):
    return sorted(
        (str(r["window_start"]), r["user_id"], r["n_events"])
        for r in spark.read.parquet(os.path.join(out_dir, "data")).collect()
    )


def test_watermark_window_emission_and_late_drop(spark):
    in_dir = tempfile.mkdtemp(prefix="odb_win_in_")
    out_dir = tempfile.mkdtemp(prefix="odb_win_out_")
    from datetime import datetime

    t = lambda s: datetime.fromisoformat(f"2026-01-01 {s}")  # noqa: E731
    try:
        # batch 1: two events in the 10:00 window, one at 12:30. The
        # 12:30 event advances the watermark to 12:00, sealing the 10:00
        # window — availableNow runs a final flush micro-batch, so the
        # sealed window emits within this same pass.
        b1 = spark.createDataFrame(
            [
                (1, "u1", t("10:10:00"), 1.0),
                (2, "u1", t("10:20:00"), 2.0),
                (3, "u1", t("12:30:00"), 4.0),
            ],
            SCHEMA,
        )
        b1.write.mode("append").parquet(in_dir)
        _run_pass(spark, in_dir, out_dir)
        assert _rows(spark, out_dir) == [("2026-01-01 10:00:00", "u1", 2)]

        # batch 2: a LATE event for the sealed 10:00 window (must be
        # dropped) plus a 13:30 event that pushes the watermark to 13:00,
        # sealing the 12:00 window. The restart proves the watermark
        # survived the checkpoint.
        b2 = spark.createDataFrame(
            [
                (4, "u1", t("10:15:00"), 100.0),  # late -> dropped
                (5, "u1", t("13:30:00"), 8.0),
            ],
            SCHEMA,
        )
        b2.write.mode("append").parquet(in_dir)
        _run_pass(spark, in_dir, out_dir)

        got = _rows(spark, out_dir)
        # 10:00 window emitted with n=2 (late event NOT counted);
        # 12:00 window emitted with n=1; 13:00 window still open.
        assert got == [
            ("2026-01-01 10:00:00", "u1", 2),
            ("2026-01-01 12:00:00", "u1", 1),
        ], got
    finally:
        shutil.rmtree(in_dir, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
