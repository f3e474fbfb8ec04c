"""Batch assemble -> refine -> parse: the LLM-call stage rebuilt as a
deterministic confidence-gated cleanup (U2/U3 in SURVEY.md §2.9), plus the
header-split response parser (T6, §2.8).

Reference shape (llm/text_pipeline.py:57-162 + llm/text_processing.py):
per (doc, batch): concatenate '--- Frame i ---' blocks (A3), send to the
model, parse the '==== TASK n ====' response back to per-frame lists.

Rebuild: the network call is replaced by :func:`refine_text_batch` — a
pure function producing the same response *shape* (task3 cleaned list,
task4 markdown list, task5 summary). The assemble -> respond -> parse
round trip runs for real inside one partition-level vectorized stage, so
the parser (reference llm/text_processing.py:137-272 semantics) is
exercised on every batch.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.cleanup import clean_ocr_text
from .grouped import grouped_map_in_pandas, iter_groups

TASK3_HEADER = "==== TASK 3: CLEANED AND CORRECTED OCR TEXT ===="
TASK4_HEADER = "==== TASK 4: MARKDOWN REPRESENTATION ===="
TASK5_HEADER = "==== TASK 5: CONTEXTUAL SUMMARY AND KEY INFORMATION ===="

_FRAME_RE = re.compile(r"(\d+)\s*--\n?(.*)", re.DOTALL)

SUMMARY_LEN = 80


# ---------------------------------------------------------------------------
# A3 assemble (reference llm/text_pipeline.py:77-81)
# ---------------------------------------------------------------------------


def assemble_batch(frames: list[tuple[int, str]]) -> str:
    out = ""
    for idx, text in sorted(frames, key=lambda x: x[0]):
        out += f"--- Frame {idx} ---\n{text}\n\n"
    return out.strip()


# ---------------------------------------------------------------------------
# U2/U3 stand-in: deterministic refinement producing the response format
# ---------------------------------------------------------------------------


def refine_text_batch(frames: list[tuple[int, str]]) -> str:
    """Deterministic 'model': cleanup each frame (confidence gate = the
    cleanup itself), markdown-ify, summarize = first SUMMARY_LEN chars of
    the concatenated cleaned text. Emits the exact response format the
    parser expects."""
    ordered = sorted(frames, key=lambda x: x[0])
    cleaned = [(i, clean_ocr_text(t)) for i, t in ordered]
    md = [(i, f"## Frame {i}\n{c}") for i, c in cleaned]
    # stripped at build time so the parser's strip is the identity
    summary = " ".join(c for _, c in cleaned)[:SUMMARY_LEN].strip()
    parts = [TASK3_HEADER]
    for i, c in cleaned:
        parts.append(f"-- Frame {i} --\n{c}")
    parts.append(TASK4_HEADER)
    for i, m in md:
        parts.append(f"-- Frame {i} --\n{m}")
    parts.append(TASK5_HEADER)
    parts.append(summary)
    return "\n\n".join(parts)


# ---------------------------------------------------------------------------
# T6 parse (reference llm/text_processing.py:137-272 semantics)
# ---------------------------------------------------------------------------


def parse_llm_response(response_text: str) -> dict | None:
    """Header-split parse. Returns None on empty/unparseable input."""
    if not response_text:
        return None
    response_text = response_text.strip()
    if not response_text:
        return None
    out = {"task3_cleaned_text": [], "task4_markdown_text": [], "task5_summary": ""}

    i3 = response_text.find(TASK3_HEADER)
    i4 = response_text.find(TASK4_HEADER)
    i5 = response_text.find(TASK5_HEADER)

    raw3 = raw4 = ""
    if i3 != -1:
        end3 = i4 if i4 != -1 else (i5 if i5 != -1 else len(response_text))
        raw3 = response_text[i3 + len(TASK3_HEADER) : end3].strip()
    if i4 != -1:
        end4 = i5 if i5 != -1 else len(response_text)
        raw4 = response_text[i4 + len(TASK4_HEADER) : end4].strip()
    if i5 != -1:
        out["task5_summary"] = response_text[i5 + len(TASK5_HEADER) :].strip()

    def frames_of(block: str) -> list[str]:
        frames = []
        if not block:
            return frames
        for part in block.split("-- Frame "):
            if not part.strip():
                continue
            m = _FRAME_RE.match(part)
            if m:
                frames.append(m.group(2).strip())
        return frames

    if raw3:
        out["task3_cleaned_text"] = frames_of(raw3)
    if raw4:
        out["task4_markdown_text"] = frames_of(raw4)

    if (
        not out["task3_cleaned_text"]
        and not out["task4_markdown_text"]
        and not out["task5_summary"]
    ):
        return None
    return out


# ---------------------------------------------------------------------------
# Spark stage: per (doc_id, batch_id) assemble -> refine -> parse -> rows
# ---------------------------------------------------------------------------


def refine_batches(df: DataFrame) -> DataFrame:
    """Input rows: (doc_id, batch_id, frame_seq, text). Output rows:
    (doc_id, batch_id, frame_seq, cleaned, markdown, summary) — the parsed
    per-frame results positionally joined back (J2 semantics: i-th parsed
    item <-> i-th frame of the batch)."""

    def _block(block: pd.DataFrame) -> pd.DataFrame:
        rows: dict[str, list] = {
            "doc_id": [], "batch_id": [], "frame_seq": [],
            "cleaned": [], "markdown": [], "summary": [],
        }
        for s, e in iter_groups(block, ["doc_id", "batch_id"]):
            g = block.iloc[s:e]
            frames = list(zip(g["frame_seq"].tolist(), g["text"].tolist()))
            response = refine_text_batch(frames)
            parsed = parse_llm_response(response)
            if parsed is None:
                continue
            c_list = parsed["task3_cleaned_text"]
            m_list = parsed["task4_markdown_text"]
            seqs = sorted(g["frame_seq"].tolist())
            n = min(len(seqs), len(c_list), len(m_list))
            doc_id = g["doc_id"].iloc[0]
            batch_id = g["batch_id"].iloc[0]
            for k in range(n):
                rows["doc_id"].append(doc_id)
                rows["batch_id"].append(batch_id)
                rows["frame_seq"].append(seqs[k])
                rows["cleaned"].append(c_list[k])
                rows["markdown"].append(m_list[k])
                rows["summary"].append(parsed["task5_summary"])
        return pd.DataFrame(rows)

    return grouped_map_in_pandas(
        df.select("doc_id", "batch_id", "frame_seq", "text"),
        ["doc_id", "batch_id"],
        ["frame_seq"],
        _block,
        "doc_id string, batch_id int, frame_seq int, cleaned string, "
        "markdown string, summary string",
    )
