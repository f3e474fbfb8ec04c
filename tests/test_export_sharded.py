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


def test_read_manifest_rejects_uri_schemes_and_missing_dirs(spark):
    """os.walk yields nothing for URI-schemed or missing paths; that
    must be a loud error, never a silently empty manifest (a caller
    would conclude zero shards were written)."""
    import pytest

    with pytest.raises(ValueError, match="URI-schemed"):
        read_manifest(spark, "s3://bucket/export")
    with pytest.raises(ValueError, match="does not exist"):
        read_manifest(spark, "/nonexistent/odb/export/dir")


def test_manifest_ignores_temporary_and_hidden_dirs(spark, sf_dir):
    """A killed writer's _temporary/.../part-*.parquet (or a hidden
    dir's files) must never be counted as committed shards — the walk
    prunes every path segment starting with '_' or '.', matching the
    Hadoop hidden-file filter the spark.read path applied."""
    import os
    import shutil
    import tempfile

    from ocr_dataset_builder_spark.sources.export import (
        export_sharded,
        validate_export,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    n = d.count()
    out = tempfile.mkdtemp(prefix="odb_export_tmp_")
    try:
        export_sharded(d, out, partition_col="source", max_records_per_file=200)
        summary = validate_export(spark, out, expected_rows=n, max_records_per_file=200)
        # inject orphan files a crashed attempt would leave behind
        for junk in ("_temporary/0/task_1", ".hidden"):
            jdir = os.path.join(out, junk)
            os.makedirs(jdir, exist_ok=True)
            d.limit(5).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(jdir, "junk")
            )
        summary2 = validate_export(spark, out, expected_rows=n, max_records_per_file=200)
        assert summary2["total_rows"] == summary["total_rows"] == n
    finally:
        shutil.rmtree(out, ignore_errors=True)
