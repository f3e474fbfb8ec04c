"""T5 — image-pipeline multi-task response parser (SURVEY.md §2.8).

Reference semantics (llm/image_processing.py:234-347): locate the five
``==== TASK n: ... ====`` blocks by multiline regex, split each into
``-- Frame N --`` chunks, densify frame indices 0..max with '' (W5), and
replace ``<<< SAME_AS_PREVIOUS >>>`` with the previous *resolved* frame
(frame 0 / missing predecessor -> '', W2). Task 5 is the summary with no
redundancy handling.

The multiline/dotall regex splitting is awkward as pure Spark SQL, so the
Spark stage runs this as a batch function over Arrow batches (one response
string per (doc, batch) row).
"""

from __future__ import annotations

import re

SAME_AS_PREVIOUS = "<<< SAME_AS_PREVIOUS >>>"

TASK_PATTERN = re.compile(r"^====\s*(TASK \d+:[^=]+?)\s*====$", re.MULTILINE | re.IGNORECASE)
FRAME_PATTERN = re.compile(
    r"^--\s*Frame (\d+)\s*--$\n(.*?)(?=^--\s*Frame \d+\s*--$|\Z)",
    re.MULTILINE | re.DOTALL | re.IGNORECASE,
)

TASK_KEYS = {
    1: "task1_raw_ocr",
    2: "task2_augmented",
    3: "task3_cleaned",
    4: "task4_markdown",
}


def parse_image_response(response_text: str) -> dict | None:
    if not response_text:
        return None
    parsed: dict = {}

    matches = list(TASK_PATTERN.finditer(response_text))
    blocks: dict[int, str] = {}
    for i, m in enumerate(matches):
        end = matches[i + 1].start() if i + 1 < len(matches) else len(response_text)
        blocks[i + 1] = response_text[m.end() : end].strip()

    for task_num in range(1, 5):
        key = TASK_KEYS[task_num]
        parsed[key] = []
        content = blocks.get(task_num)
        if not content:
            continue
        frames: dict[int, str] = {}
        for fm in FRAME_PATTERN.finditer(content):
            try:
                frames[int(fm.group(1))] = fm.group(2).strip()
            except (IndexError, ValueError):
                continue
        if not frames:
            continue
        for i in range(max(frames.keys()) + 1):
            cur = frames.get(i, "")
            if cur == SAME_AS_PREVIOUS:
                if i > 0 and len(parsed[key]) > 0:
                    parsed[key].append(parsed[key][i - 1])
                else:
                    parsed[key].append("")
            else:
                parsed[key].append(cur)

    c5 = blocks.get(5)
    parsed["task5_summary"] = c5 if c5 else ""
    return parsed


def parse_batches(df, response_col: str = "response"):
    """T5 Spark stage: one multi-task response string per (doc_id,
    batch_id) row in, long rows (doc_id, batch_id, task, frame_idx,
    value) out — tasks 1-4 exploded per densified frame index (W5 gaps
    as '', W2 placeholders resolved inside the parse, exactly reference
    llm/image_processing.py:242-347), task 5 as a single frame_idx=-1
    summary row. Runs as mapInPandas over Arrow batches: one Python
    crossing per batch of responses, never per row."""
    from collections.abc import Iterator

    import pandas as pd

    schema = "doc_id string, batch_id int, task string, frame_idx int, value string"

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "batch_id": [], "task": [], "frame_idx": [], "value": []
            }

            def _emit(doc, b, task, idx, val):
                out["doc_id"].append(doc)
                out["batch_id"].append(int(b))
                out["task"].append(task)
                out["frame_idx"].append(int(idx))
                out["value"].append(val)

            for doc, b, resp in zip(
                pdf["doc_id"], pdf["batch_id"], pdf[response_col]
            ):
                parsed = parse_image_response(resp)
                if parsed is None:
                    continue
                for key in TASK_KEYS.values():
                    for i, v in enumerate(parsed[key]):
                        _emit(doc, b, key, i, v)
                _emit(doc, b, "task5_summary", -1, parsed["task5_summary"])
            yield pd.DataFrame(out)

    return df.mapInPandas(_gen, schema)


def build_image_response(
    tasks: dict[int, list[tuple[int, str]]], summary: str
) -> str:
    """Inverse of parse_image_response (for round-trip tests): emit the
    5-task block format."""
    titles = {
        1: "TASK 1: RAW OCR",
        2: "TASK 2: AUGMENTED OCR",
        3: "TASK 3: CLEANED OCR",
        4: "TASK 4: MARKDOWN",
    }
    parts = []
    for n in range(1, 5):
        parts.append(f"==== {titles[n]} ====")
        for idx, text in sorted(tasks.get(n, [])):
            parts.append(f"-- Frame {idx} --\n{text}")
    parts.append("==== TASK 5: SUMMARY ====")
    parts.append(summary)
    return "\n".join(parts)
