"""OCR text cleanup — T1 in SURVEY.md §2.8.

Reference semantics (/root/reference ocr_dataset_builder/tesseract/ocr_utils.py:3-56,
applied per-frame at data/pytorch_dataset.py:584):

1. normalize ``\\r\\n`` and ``\\r`` to ``\\n``
2. split into lines, strip each line, drop lines that become empty
3. join surviving lines with single ``\\n``
4. collapse runs of spaces/tabs within lines to a single space
5. collapse 3+ newlines to 2 (vacuous after step 2 — no empty lines remain)
6. final strip

Implemented three ways, all semantically identical:

* :func:`clean_ocr_text` — pure-Python reference-parity implementation
  (used by tests as the local oracle).
* :func:`clean_ocr_col` — **JVM-side Spark column expression** (split /
  transform / filter / array_join / regexp_replace). This is the hot-path
  version: it stays inside whole-stage codegen, no Python boundary, so at
  100 TB the cleanup costs nothing beyond the scan.
* :func:`duckdb_clean_sql` — the equivalent DuckDB SQL snippet for the
  driver's oracle comparison.

Unicode note: the reference uses ``str.strip()`` (unicode-aware); the SQL
variants strip ASCII whitespace (``\\s``). The corpora here are ASCII, and
tests pin the ASCII behavior.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_WS_RUN = re.compile(r"[ \t]+")


def clean_ocr_text(text: str | None) -> str:
    """Pure-Python reference-parity cleanup (reference ocr_utils.py:3-56)."""
    if not text:
        return ""
    lines = text.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    cleaned = [ln.strip() for ln in lines]
    cleaned = [ln for ln in cleaned if ln]
    if not cleaned:
        return ""
    joined = "\n".join(_WS_RUN.sub(" ", ln) for ln in cleaned)
    joined = re.sub(r"\n{3,}", "\n\n", joined)
    return joined.strip()


def clean_ocr_col(c: Column) -> Column:
    """JVM-side cleanup. Equivalent to :func:`clean_ocr_text` for ASCII."""
    norm = F.regexp_replace(
        F.regexp_replace(F.coalesce(c, F.lit("")), "\r\n", "\n"), "\r", "\n"
    )
    lines = F.split(norm, "\n", -1)
    stripped = F.transform(
        lines,
        lambda x: F.regexp_replace(F.regexp_replace(x, "^\\s+", ""), "\\s+$", ""),
    )
    nonempty = F.filter(stripped, lambda x: x != F.lit(""))
    joined = F.array_join(nonempty, "\n")
    # runs of spaces/tabs cannot cross \n, so one global pass == per-line
    return F.regexp_replace(joined, "[ \t]+", " ")


def duckdb_clean_sql(expr: str) -> str:
    """DuckDB SQL snippet computing the same cleanup over ``expr``."""
    # DuckDB array_to_string([]) yields NULL — coalesce the whole chain.
    return (
        "coalesce(regexp_replace("
        "array_to_string("
        "list_filter("
        "list_transform("
        f"string_split(replace(replace(coalesce({expr}, ''), chr(13)||chr(10), chr(10)), chr(13), chr(10)), chr(10)), "
        "x -> regexp_replace(regexp_replace(x, '^\\s+', ''), '\\s+$', '')"
        "), x -> x <> ''"
        "), chr(10)"
        "), '[ ' || chr(9) || ']+', ' ', 'g'), '')"
    )
