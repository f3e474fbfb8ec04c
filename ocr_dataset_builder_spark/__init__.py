"""ocr_dataset_builder_spark — a PySpark-native extraction engine.

A brand-new, Spark-first rebuild of the *capabilities* of
pieces-app/ocr-dataset-builder (reference at /root/reference, read-only):
interleaved text+media span documents -> OCR-style text extraction and
cleanup -> frame-sequence dedup (F:i notation) -> batch assembly/parse ->
strict joins -> window-ordered span reassembly, with per-partition lineage
and anti-join resume.

Everything is the DataFrame API + vectorized pandas/Arrow UDFs — no RDDs,
no per-row Python.
"""

__version__ = "0.1.0"
