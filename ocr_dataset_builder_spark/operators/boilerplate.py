"""Main-content extraction: HTML boilerplate strip + DOM heuristics
(north rule: "HTML boilerplate strip, PDF/layout parse, DOM heuristics").

All JVM-side column expressions (regexp kernels inside whole-stage
codegen) — boilerplate stripping at 10^12 documents must not touch
Python. Three layers, mirroring production web-extraction pipelines:

1. **Structural strip** (:func:`strip_html_col`): drop script/style and
   chrome containers (nav/header/footer), strip tags, normalize
   whitespace — the readability-style baseline.
2. **DOM block heuristics** (:func:`block_features`): segment on
   block-level tags, score each block by text length and link density —
   content blocks are long and link-sparse (the Boilerpipe/jusText
   signal).
3. **Frequency boilerplate** (:mod:`queries_html` phrase queries):
   phrases recurring across many documents of the same source are
   template chrome — detected with one groupBy over (source, phrase),
   the linear-shuffle form that works at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DROP_BLOCKS = [
    r"(?s)<script[^>]*>.*?</script>",
    r"(?s)<style[^>]*>.*?</style>",
    r"(?s)<(nav|footer|header)[^>]*>.*?</(nav|footer|header)>",
]
_TAG = r"<[^>]*>"
_BLOCK_SPLIT = r"(?i)</?(p|div|nav|footer|header|h1|h2|li|ul|table|tr|td)[^>]*>"
_LINK_TEXT = r"(?s)<a[^>]*>(.*?)</a>"


def strip_html_col(c: Column) -> Column:
    """Main text of an HTML document (chrome containers dropped)."""
    for pat in _DROP_BLOCKS:
        c = F.regexp_replace(c, pat, " ")
    c = F.regexp_replace(c, _TAG, " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def duckdb_strip_html_sql(expr: str) -> str:
    out = expr
    for pat in _DROP_BLOCKS + [_TAG]:
        out = f"regexp_replace({out}, '{pat}', ' ', 'g')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"


def block_features(
    df: DataFrame, html_col: str = "html", keep_text: bool = False
) -> DataFrame:
    """Segment HTML into blocks and score each: (doc_id, block_id,
    text_len, link_density, is_content). ``keep_text`` carries the
    block's extracted text through (for content re-assembly)."""
    blocks = df.select(
        "doc_id",
        F.posexplode(F.split(F.col(html_col), _BLOCK_SPLIT, -1)).alias(
            "block_id", "raw"
        ),
    )
    text = F.trim(F.regexp_replace(F.regexp_replace("raw", _TAG, " "), r"\s+", " "))
    link_text = F.array_join(F.regexp_extract_all("raw", F.lit(_LINK_TEXT), 1), " ")
    feat = blocks.select(
        "doc_id",
        "block_id",
        text.alias("text"),
        F.length(text).alias("text_len"),
        F.length(F.trim(F.regexp_replace(link_text, r"\s+", " "))).alias("link_len"),
    ).where(F.col("text_len") > 0)
    link_density = F.round(
        F.col("link_len") / F.greatest(F.col("text_len"), F.lit(1)), 6
    )
    extra = [F.col("text")] if keep_text else []
    return feat.select(
        "doc_id",
        "block_id",
        *extra,
        "text_len",
        link_density.alias("link_density"),
        ((F.col("text_len") >= 15) & (link_density < 0.5)).alias("is_content"),
    )


def duckdb_block_features_sql(html_expr: str) -> str:
    """DuckDB mirror of block_features over a relation exposing
    (doc_id, {html_expr})."""
    return f"""
blocks AS (
  SELECT doc_id,
         CAST(u.i - 1 AS INT) AS block_id,
         u.raw
  FROM (
    SELECT doc_id,
           unnest(list_transform(regexp_split_to_array({html_expr}, '{_BLOCK_SPLIT}'),
                                 (x, i) -> struct_pack(i := i, raw := x))) AS u
    FROM html_docs
  )
),
feat AS (
  SELECT doc_id, block_id,
         trim(regexp_replace(regexp_replace(raw, '{_TAG}', ' ', 'g'), '\\s+', ' ', 'g')) AS text,
         length(trim(regexp_replace(regexp_replace(raw, '{_TAG}', ' ', 'g'), '\\s+', ' ', 'g'))) AS text_len,
         length(trim(regexp_replace(coalesce(array_to_string(regexp_extract_all(raw, '{_LINK_TEXT}', 1), ' '), ''), '\\s+', ' ', 'g'))) AS link_len
  FROM blocks
)
"""
