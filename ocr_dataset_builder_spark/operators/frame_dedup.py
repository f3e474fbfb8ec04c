"""Frame-sequence dedup: the F:i notation encode/decode pair and the
SAME_AS_PREVIOUS forward fill.

SURVEY.md §2.5: W3 (encode), W1 (decode/reconstruct), W2 (placeholder fill),
W5 (max-frame densify).

* encode / fill / densify are pure window expressions (JVM-side).
* decode has a recursive prefix dependency (value at i references resolved
  value at j < i, reference data/pytorch_dataset.py:189-268) — not a plain
  window function. It runs as ``applyInPandas`` per (doc_id, task): one
  O(n) forward pass over the group, Arrow-batched. Refs always point
  backward, so a single pass suffices (the reference's memo cache falls out
  of keeping the resolved list).

Scale note: groups are (doc, task) — bounded by frames-per-video. The
shuffle is hash(doc_id, task); skew from one giant doc is limited to the
size of that doc's frame list, and the Arrow batch carries only
(seq, value) pairs.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SAME_AS_PREVIOUS = "<<< SAME_AS_PREVIOUS >>>"


# ---------------------------------------------------------------------------
# W3 — redundancy encode (prompt spec prompts/ocr_image_multi_task_prompt.md:19-36)
# ---------------------------------------------------------------------------


def encode_redundancy(
    df: DataFrame,
    text_col: str = "text",
    seq_col: str = "frame_seq",
    part_cols: list[str] | None = None,
    out_col: str = "encoded",
) -> DataFrame:
    """Emit ``F:i-1`` when identical to the previous frame, ``F:i-1<\\n>tail``
    when the previous frame is a strict line-prefix, else the full text.
    Frame 0 is never encoded."""
    part_cols = part_cols or ["doc_id"]
    w = Window.partitionBy(*part_cols).orderBy(seq_col)
    prev = F.lag(text_col).over(w)
    ref = F.concat(F.lit("F:"), (F.col(seq_col) - 1).cast("string"))
    text = F.col(text_col)
    is_prefix = text.startswith(F.concat(prev, F.lit("\n")))
    tail = F.expr(f"substring({text_col}, length(_prev) + 1)")
    return (
        df.withColumn("_prev", prev)
        .withColumn(
            out_col,
            F.when(F.col("_prev").isNull(), text)
            .when(text == F.col("_prev"), ref)
            .when(is_prefix, F.concat(ref, tail))
            .otherwise(text),
        )
        .drop("_prev")
    )


# ---------------------------------------------------------------------------
# W1 — F:i decode (reference data/pytorch_dataset.py:189-268)
# ---------------------------------------------------------------------------


def decode_fref_list(vals: list[str | None]) -> list[str]:
    """Reference-parity reconstruction of one task list (index == position).

    Semantics pinned to data/pytorch_dataset.py:218-268: ``F:`` + leading
    digits -> backward ref; no digits, self-ref, or forward ref keeps the
    raw value; appended content after the digits is concatenated to the
    resolved referenced value.
    """
    out: list[str] = []
    for i, v in enumerate(vals):
        v = v if v is not None else ""
        if v.startswith("F:"):
            rest = v[2:]
            j = 0
            while j < len(rest) and rest[j].isdigit():
                j += 1
            digits, tail = rest[:j], rest[j:]
            if not digits:
                out.append(v)
                continue
            ref = int(digits)
            if ref >= i:
                out.append(v)
                continue
            out.append(out[ref] + tail)
        else:
            out.append(v)
    return out


def decode_fref_in_row(
    df: DataFrame,
    text_col: str = "encoded",
    seq_col: str = "frame_seq",
    part_cols: list[str] | None = None,
    out_col: str = "decoded",
) -> DataFrame:
    """W1 reconstruction with NO Python stage and NO join-back: collect
    each group's rows into one array (groups are bounded by frames per
    video, so a group always fits a row), run the sequential forward pass
    as an in-row ``aggregate`` fold in the JVM, and ``inline`` the rows
    back out. Same semantics as :func:`decode_fref_list` (pinned by the
    shared fixtures in tests/test_frame_dedup.py).

    Compared to :func:`decode_fref` (mapInPandas) inside a larger
    composition, this keeps every passenger column in the JVM and — when
    the input is already hash-partitioned on the group key (e.g. after a
    per-group window) — adds zero Exchanges, where the mapInPandas form
    forces a join back to the passenger columns that re-derives the whole
    upstream plan."""
    part_cols = part_cols or ["doc_id"]
    others = [c for c in df.columns if c not in part_cols and c != seq_col]

    def step(acc: F.Column, x: F.Column) -> F.Column:
        digits = F.regexp_extract(x, r"^F:([0-9]+)", 1)
        ref = digits.cast("int")
        resolved = F.concat(
            F.element_at(acc, ref + 1), F.regexp_replace(x, r"^F:[0-9]+", "")
        )
        keep_raw = (digits == "") | (ref >= F.size(acc))
        return F.concat(
            acc, F.array(F.when(keep_raw, x).otherwise(resolved))
        )

    g = df.groupBy(*part_cols).agg(
        F.array_sort(F.collect_list(F.struct(seq_col, *others))).alias("_rows")
    )
    encs = F.transform("_rows", lambda r: F.coalesce(r[text_col], F.lit("")))
    dec = F.aggregate(
        encs, F.array().cast("array<string>"), step
    )
    return (
        g.withColumn("_z", F.arrays_zip("_rows", dec.alias("_dec")))
        .select(*part_cols, F.inline("_z"))
        .select(*part_cols, F.col("_rows.*"), F.col("_dec").alias(out_col))
    )


def decode_fref(
    df: DataFrame,
    text_col: str = "encoded",
    seq_col: str = "frame_seq",
    part_cols: list[str] | None = None,
    out_col: str = "decoded",
) -> DataFrame:
    """Group-wise forward-pass reconstruction, partition-batched.

    Requires ``seq_col`` to be the dense 0-based frame index per group
    (the reference indexes into the concatenated task list by position).

    Implementation: repartition on the group key, sort within partitions,
    then ONE ``mapInPandas`` pass that walks Arrow batches and cuts groups
    at key boundaries (carrying a possibly-split trailing group into the
    next batch). This costs one Python crossing per *batch* instead of per
    *group* — with millions of small doc groups, per-group applyInPandas
    pays ~ms of Arrow/pandas overhead each, which dominated the benchmark.
    """
    from .grouped import grouped_map_in_pandas, iter_groups

    part_cols = part_cols or ["doc_id"]
    out_fields = ", ".join(
        [f"{c} string" for c in part_cols]
        + [f"{seq_col} int", f"{out_col} string"]
    )

    def _block(block: pd.DataFrame) -> pd.DataFrame:
        vals = block[text_col].tolist()
        out_vals: list[str] = []
        for s, e in iter_groups(block, part_cols):
            out_vals.extend(decode_fref_list(vals[s:e]))
        res = block[part_cols + [seq_col]].copy()
        res[out_col] = out_vals
        return res

    return grouped_map_in_pandas(
        df.select(*part_cols, seq_col, text_col),
        part_cols,
        [seq_col],
        _block,
        out_fields,
    )


# ---------------------------------------------------------------------------
# W2 — SAME_AS_PREVIOUS forward fill (reference llm/image_processing.py:311-334)
# ---------------------------------------------------------------------------


def fill_same_as_previous(
    df: DataFrame,
    text_col: str = "text",
    seq_col: str = "frame_seq",
    part_cols: list[str] | None = None,
    out_col: str = "filled",
    placeholder: str = SAME_AS_PREVIOUS,
) -> DataFrame:
    """Placeholder at frame i>0 takes frame i-1's *resolved* value (chains
    collapse); at frame 0 (or no predecessor) it becomes ''."""
    part_cols = part_cols or ["doc_id"]
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(seq_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_ph = F.col(text_col) == placeholder
    last_real = F.last(
        F.when(~is_ph, F.col(text_col)), ignorenulls=True
    ).over(w)
    return df.withColumn(
        out_col,
        F.when(is_ph, F.coalesce(last_real, F.lit(""))).otherwise(F.col(text_col)),
    )


# ---------------------------------------------------------------------------
# W5 — max-frame densification (reference llm/image_processing.py:305-315)
# ---------------------------------------------------------------------------


def densify_frames(
    df: DataFrame,
    seq_col: str = "frame_seq",
    part_col: str = "doc_id",
    value_cols: Iterable[str] = ("text",),
) -> DataFrame:
    """Fill missing indices 0..max(seq) per doc with '' values."""
    spine = (
        df.groupBy(part_col)
        .agg(F.max(seq_col).alias("_mx"))
        .select(
            part_col,
            F.explode(F.sequence(F.lit(0), F.col("_mx"))).alias(seq_col),
        )
    )
    joined = spine.join(df, [part_col, seq_col], "left")
    for c in value_cols:
        joined = joined.withColumn(c, F.coalesce(F.col(c), F.lit("")))
    return joined
