"""spark-submit entry point: resumable span extraction over a nested
documents table.

    spark-submit --py-files dist/ocr_dataset_builder_spark.zip \
        scripts/submit_extract.py --input <path> --output <dir> [--run-id r1]

The input is the contract-shaped parquet/Iceberg table
(doc_id, spans array<struct<kind,text,media_ref,offset>>). A killed run
resumes: completed docs are anti-joined away via the lineage checkpoint.

``--dry-run`` plans without writing (reference
video/frame_pipeline.py:297-304): prints how many docs are pending after
the resume anti-join and the optimized physical plan of the extraction.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument(
        "--run-id",
        default="auto",
        help="explicit run id (refused if already committed while docs are "
        "pending), or 'auto' (default) to derive the next unused run<i> "
        "from the checkpoint — rerun-to-resume never risks a committed dir",
    )
    ap.add_argument("--table", action="store_true", help="input is a catalog table name")
    ap.add_argument(
        "--dry-run",
        action="store_true",
        help="plan only: report pending docs + physical plan, write nothing",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from ocr_dataset_builder_spark.pipeline import run_extraction

    spark = SparkSession.builder.appName("odb-extract").getOrCreate()
    nested = (
        spark.read.table(args.input) if args.table else spark.read.parquet(args.input)
    )
    if args.dry_run:
        from ocr_dataset_builder_spark.lineage import pending_docs, read_checkpoint
        from ocr_dataset_builder_spark.pipeline import extract_spans

        ck = read_checkpoint(spark, args.output)
        pending = pending_docs(nested, ck)
        n_pending = pending.count()
        n_done = ck.where("status = 'done'").select("doc_id").distinct().count()
        print(f"dry-run: {n_pending} docs pending, {n_done} already checkpointed")
        extract_spans(pending).explain("formatted")
        return
    run_id = args.run_id
    if run_id == "auto":
        from ocr_dataset_builder_spark.pipeline import next_run_id

        run_id = next_run_id(spark, args.output)
    n = run_extraction(spark, nested, args.output, run_id=run_id)
    print(f"processed {n} docs (run_id={run_id})")


if __name__ == "__main__":
    main()
