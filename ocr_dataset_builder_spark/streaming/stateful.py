"""Custom stateful streaming operator: cross-batch frame-sequence dedup.

The batch engine dedups consecutive identical frames with a window
lag-compare (W3). In a stream, consecutive frames of one doc can arrive
in different micro-batches, so the comparison state (the last seen text
per doc) must live in the state store — this is
``applyInPandasWithState`` (the brief's custom-stateful-operator path).

Semantics: for each (doc_id) group, emit only frames whose text differs
from the previous frame's text in (frame_seq) order, carrying the last
(seq, text) across micro-batches. Exactly the reference's "identical
frame → F:i ref" decision, as a streaming filter.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("frame_seq", IntegerType()),
        StructField("text", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_seq", IntegerType()),
        StructField("last_text", StringType()),
    ]
)


def dedup_frames_with_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState function: emit non-duplicate frames, keep
    the last (seq, text) in the state store."""
    if state.exists:
        last_seq, last_text = state.get
    else:
        last_seq, last_text = -1, None

    out_doc, out_seq, out_text = [], [], []
    doc_id = key[0]
    for pdf in pdfs:
        pdf = pdf.sort_values("frame_seq")
        for seq, text in zip(pdf["frame_seq"].tolist(), pdf["text"].tolist()):
            if seq <= last_seq:
                continue  # late/duplicate delivery — already decided
            if text != last_text:
                out_doc.append(doc_id)
                out_seq.append(int(seq))
                out_text.append(text)
            last_seq, last_text = int(seq), text

    state.update((last_seq, last_text))
    if out_doc:
        yield pd.DataFrame(
            {"doc_id": out_doc, "frame_seq": out_seq, "text": out_text}
        )


def streaming_dedup(frames_stream):
    """Wire the stateful dedup onto a streaming DataFrame with columns
    (doc_id, frame_seq, text)."""
    return (
        frames_stream.groupBy("doc_id")
        .applyInPandasWithState(
            dedup_frames_with_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_exact_dedup(docs_stream, lateness: str = "10 minutes"):
    """Corpus-scale streaming EXACT dedup: drop re-deliveries of the same
    content fingerprint within the watermark horizon.

    This is the streaming twin of the batch ``dedup_exact`` operator —
    built on ``dropDuplicatesWithinWatermark`` so the state store holds
    one row per fingerprint only until the watermark passes it (bounded
    state), instead of forever like a plain ``dropDuplicates`` would on
    a stream. Input columns: (doc_id, text, ts). The fingerprint is
    md5(text), computed JVM-side; within the horizon the FIRST arrival
    wins and later identical-content docs are dropped.
    """
    from pyspark.sql import functions as F

    return (
        docs_stream.withColumn("fp", F.md5("text"))
        .withWatermark("ts", lateness)
        .dropDuplicatesWithinWatermark(["fp"])
        .select("doc_id", "fp", "ts")
    )
