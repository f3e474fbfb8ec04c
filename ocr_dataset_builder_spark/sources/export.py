"""Sharded dataset export — the write path a 100 TB corpus job ends
with: size-bounded parquet shards in a partitioned layout plus a
manifest of what was written.

Design for scale:

* ``partitionBy(source)`` gives the consumer partition pruning;
  ``maxRecordsPerFile`` bounds every shard so downstream loaders get
  uniform work units (a single skewed task cannot emit a 100 GB file);
* one ``repartition(n, source)`` ahead of the write controls the
  file count floor (without it, every task writes a sliver of every
  partition — the classic small-files problem);
* the manifest is derived from the committed files themselves (one
  driver-side listing of file metadata, no data re-read) so it cannot
  drift from what is actually on disk.

No reference counterpart (the reference writes loose per-video JSON,
data/extract_text_dataset.py) — this is the engine's bulk-export twin
of the run-scoped extraction sink in pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def export_sharded(
    df: DataFrame,
    path: str,
    partition_col: str = "source",
    max_records_per_file: int = 10_000,
    n_tasks: int | None = None,
) -> None:
    """Write ``df`` as parquet shards under ``path`` partitioned by
    ``partition_col``, each shard holding at most
    ``max_records_per_file`` rows."""
    if n_tasks:
        df = df.repartition(n_tasks, partition_col)
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(partition_col)
        .parquet(path)
    )


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Manifest of an export: one row per shard with its partition
    value, row count, and byte size — derived from parquet FOOTER
    metadata only. The shard list is one filesystem listing; each
    shard contributes one footer read (num_rows lives in the footer)
    executed ON EXECUTORS via mapInPandas over the path list. Total
    cost is O(shards), never O(rows) — validate_export on a petabyte
    export reads footers, not the dataset. (Listing uses os.walk, so
    posix/local mounts ONLY; a cloud-store deployment swaps in its
    lister — and until it does, URI-schemed paths are a hard error, not
    an empty manifest: os.walk would silently yield nothing for
    s3://... and validate_export would report 'wrote 0, expected N'.)"""
    import os as _os

    from pyspark.sql import functions as F

    if "://" in path:
        raise ValueError(
            f"read_manifest lists shards with os.walk (local paths only); "
            f"got URI-schemed path {path!r} — swap in a filesystem lister "
            "for this scheme (returning an empty manifest here would "
            "silently report zero shards)"
        )
    if not _os.path.isdir(path):
        raise ValueError(
            f"read_manifest: export directory does not exist: {path!r}"
        )
    shard_paths = []
    for root, dirs, files in _os.walk(path):
        # prune hidden/temporary directories IN PLACE (the Hadoop
        # hidden-file filter applies to every path segment: a killed
        # writer's _temporary/.../part-*.parquet must never be counted
        # as a committed shard)
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for name in files:
            if name.endswith(".parquet") and not name.startswith(("_", ".")):
                shard_paths.append(_os.path.join(root, name))
    paths_df = spark.createDataFrame(
        [(p,) for p in sorted(shard_paths)], "file_path string"
    )

    def _read_footers(batches):
        import os
        import pandas as pd
        import pyarrow.parquet as pq

        for batch in batches:
            rows = [
                (p, pq.ParquetFile(p).metadata.num_rows, os.path.getsize(p))
                for p in batch["file_path"]
            ]
            yield pd.DataFrame(
                rows, columns=["file_path", "n_rows", "n_bytes"]
            )

    footers = paths_df.repartition(
        max(1, min(len(shard_paths), spark.sparkContext.defaultParallelism))
    ).mapInPandas(
        _read_footers, "file_path string, n_rows bigint, n_bytes bigint"
    )
    # the layout tail is .../<part_col>=<value>/<shard>.parquet
    return footers.select(
        F.regexp_extract("file_path", r"/([^/]+=[^/]+)/[^/]*$", 1).alias(
            "partition"
        ),
        F.regexp_extract("file_path", r"([^/]+)$", 1).alias("shard"),
        "n_rows",
        "n_bytes",
    )


def validate_export(
    spark: SparkSession,
    path: str,
    expected_rows: int,
    max_records_per_file: int,
) -> dict:
    """Post-export check a production job runs before swapping the
    dataset pointer: total rows match, and no shard exceeds the bound.
    Returns the summary dict; raises on violation."""
    m = read_manifest(spark, path).collect()
    total = sum(r["n_rows"] for r in m)
    worst = max((r["n_rows"] for r in m), default=0)
    if total != expected_rows:
        raise RuntimeError(
            f"export row mismatch: wrote {total}, expected {expected_rows}"
        )
    if worst > max_records_per_file:
        raise RuntimeError(
            f"shard bound violated: {worst} > {max_records_per_file}"
        )
    return {
        "n_shards": len(m),
        "total_rows": total,
        "max_shard_rows": worst,
        "partitions": len({r["partition"] for r in m}),
    }
