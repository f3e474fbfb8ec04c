"""PDF/layout parse (north rule component).

Real PDF decode needs poppler/pdfium — absent here, so the decode step is
a clearly-marked stub (:func:`decode_pdf`). What IS real, and what the
queries verify, is the Spark-side layout pipeline a PDF parser feeds:
positioned tokens -> reading-order sort (y, then x) -> line grouping ->
line assembly. That pipeline is pure DataFrame ops (one window per doc,
shuffle key = doc_id), so it scales like every other per-doc stage.

Synthetic layout: token i of a document is placed at
``x = (i*37) % 80``, ``y = i // 10`` — deterministic and engine-portable,
standing in for the extractor's glyph coordinates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def decode_pdf(*_args, **_kwargs):
    """Real PDF decode is not available in this container."""
    raise NotImplementedError(
        "PDF decode requires poppler/pdfium, not present in this "
        "environment; synth_layout_tokens provides the deterministic "
        "stand-in for the positioned-token stream"
    )


def synth_layout_tokens(docs: DataFrame, max_tokens: int = 60) -> DataFrame:
    """Positioned tokens: (doc_id, tok_idx, token, x, y)."""
    toks = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.posexplode(
            F.slice(F.split(F.trim(F.regexp_replace("text", r"\s+", " ")), " "), 1, max_tokens)
        ).alias("tok_idx", "token"),
    )
    return toks.select(
        "doc_id",
        "tok_idx",
        "token",
        ((F.col("tok_idx") * 37) % 80).cast("int").alias("x"),
        F.floor(F.col("tok_idx") / 10).cast("int").alias("y"),
    )


def reading_order_lines(tokens: DataFrame) -> DataFrame:
    """Reading order: sort by (y, x), group into lines, assemble text.
    Output (doc_id, line_no, line_text)."""
    return (
        tokens.groupBy("doc_id", F.col("y").alias("line_no"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("x", F.col("tok_idx"), "token"))
                    ),
                    lambda s: s["token"],
                ),
                " ",
            ).alias("line_text")
        )
    )
