"""End-to-end span-sequence equality + resume (FIXTURES.md fx_e2e, fx_resume).

Oracle = direct Python execution of the reference semantics (cleanup +
synthetic OCR + offset ordering) over the same derived rows.
"""

from __future__ import annotations

import shutil
import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F

from ocr_dataset_builder_spark import synth
from ocr_dataset_builder_spark.functions.cleanup import clean_ocr_text
from ocr_dataset_builder_spark.pipeline import extract_spans, run_extraction
from ocr_dataset_builder_spark.lineage import read_checkpoint, read_lineage


def python_oracle(sf_dir: str) -> dict[str, list[tuple]]:
    """Reference-semantics oracle: per doc, the ordered (kind, text,
    media_ref) span sequence."""
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    rows = con.sql(
        f"WITH {synth.DUCKDB_SPANS_CTE} "
        "SELECT doc_id, span_offset, kind, text, media_ref FROM span_rows "
        "ORDER BY doc_id, span_offset"
    ).fetchall()
    docs: dict[str, list[tuple]] = {}
    for doc_id, off, kind, text, media_ref in rows:
        if kind == "media":
            ocr = f"OCR {doc_id}/{media_ref}\nline {off % 5}"
            out_text = clean_ocr_text(ocr)
        else:
            out_text = clean_ocr_text(text)
        docs.setdefault(doc_id, []).append((kind, out_text, media_ref))
    return docs


@pytest.mark.parametrize("use_arrow", [True, False])
def test_span_sequence_equality(spark, sf_dir, use_arrow):
    nested = synth.documents_spans(spark, sf_dir)
    got = extract_spans(nested, use_arrow_ocr=use_arrow).collect()
    by_doc: dict[str, list] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    want = python_oracle(sf_dir)
    assert set(by_doc) == set(want)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["ord"])
        assert [r["ord"] for r in rows] == list(range(len(rows))), doc_id
        got_seq = [(r["kind"], r["text"], r["media_ref"]) for r in rows]
        assert got_seq == want[doc_id], f"span mismatch in doc {doc_id}"


def test_resume_anti_join_equals_cold_run(spark, sf_dir):
    nested = synth.documents_spans(spark, sf_dir).cache()
    half = nested.where(F.col("doc_id").cast("bigint") % 2 == 0)

    cold_dir = tempfile.mkdtemp(prefix="odb_cold_")
    warm_dir = tempfile.mkdtemp(prefix="odb_warm_")
    try:
        n_cold = run_extraction(spark, nested, cold_dir, run_id="cold")
        # warm: first run processes only half, second run resumes the rest
        n1 = run_extraction(spark, half, warm_dir, run_id="r1")
        n2 = run_extraction(spark, nested, warm_dir, run_id="r2")
        assert n1 + n2 == n_cold
        assert n2 < n_cold  # resume actually skipped completed docs

        cold = sorted(
            map(tuple, spark.read.parquet(f"{cold_dir}/extracted").collect())
        )
        warm = sorted(
            map(tuple, spark.read.parquet(f"{warm_dir}/extracted").collect())
        )
        assert cold == warm  # outputs identical to a cold run (fx_resume)

        ck = read_checkpoint(spark, warm_dir)
        assert ck.where("status = 'done'").count() == n_cold
        lin = read_lineage(spark, warm_dir)
        assert lin.count() > 0
        assert lin.where("frames_processed is null").count() == 0

        # third run: nothing pending
        n3 = run_extraction(spark, nested, warm_dir, run_id="r3")
        assert n3 == 0
    finally:
        shutil.rmtree(cold_dir, ignore_errors=True)
        shutil.rmtree(warm_dir, ignore_errors=True)
