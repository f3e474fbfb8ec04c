"""Sharded export: bounded shard sizes, partitioned layout, and a
manifest derived from the files actually committed."""

from __future__ import annotations

import shutil
import tempfile

from ocr_dataset_builder_spark.sources.export import (
    export_sharded,
    read_manifest,
    validate_export,
)


def test_export_sharded_bounds_and_manifest(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = d.count()
    out = tempfile.mkdtemp(prefix="odb_export_")
    try:
        export_sharded(
            d, out, partition_col="source", max_records_per_file=7, n_tasks=4
        )
        summary = validate_export(
            spark, out, expected_rows=n, max_records_per_file=7
        )
        assert summary["total_rows"] == n
        assert summary["max_shard_rows"] <= 7
        assert summary["partitions"] == d.select("source").distinct().count()

        m = read_manifest(spark, out)
        rows = m.collect()
        # manifest partitions match the hive layout, shards named by parquet
        assert all(r["partition"].startswith("source=") for r in rows)
        assert all(r["shard"].endswith(".parquet") for r in rows)
        assert all(r["n_bytes"] > 0 for r in rows)
        # roundtrip: reading the export yields the same doc_ids
        back = spark.read.parquet(out)
        assert back.count() == n
        assert (
            sorted(r["doc_id"] for r in back.select("doc_id").collect())
            == sorted(r["doc_id"] for r in d.select("doc_id").collect())
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_validate_export_raises_on_mismatch(spark, sf_dir):
    import pytest

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    out = tempfile.mkdtemp(prefix="odb_export_bad_")
    try:
        export_sharded(d, out, max_records_per_file=7, n_tasks=2)
        with pytest.raises(RuntimeError, match="row mismatch"):
            validate_export(spark, out, expected_rows=999999, max_records_per_file=7)
        # every committed shard holds >= 1 row, so a 0 bound must trip
        with pytest.raises(RuntimeError, match="shard bound"):
            validate_export(spark, out, expected_rows=20, max_records_per_file=0)
    finally:
        shutil.rmtree(out, ignore_errors=True)
