"""Driver-contract queries: joins, strict-mode validation, aggregations.

SURVEY.md §2.3 (J1-J6), §2.2 (F9/F10/F12), §2.4 (A4-A7), §2.8 (T9), §2.5
(W5), §2.9 (U8). Auxiliary relations (ocr_rows, llm side, checkpoint,
costs) are synthesized deterministically from the span corpus with the
same arithmetic in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import sequencing as seqops
from .operators.frame_dedup import densify_frames
from .operators.ocr import ocr_media
from .synth import DUCKDB_SPANS_CTE, duckdb_ocr_sql, span_rows

_MEDIA_CTE = """,
media_rows AS (
  SELECT doc_id, doc_key, span_offset, media_ref,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY span_offset) - 1 AS INT) AS frame_seq
  FROM span_rows WHERE kind = 'media'
)"""


def _with(extra: str = "") -> str:
    return f"WITH {DUCKDB_SPANS_CTE}{_MEDIA_CTE}{extra} "


def _media_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = span_rows(spark, sf_dir).where("kind = 'media'")
    return seqops.with_frame_seq(media, order_cols=["span_offset"]).select(
        "doc_id", "doc_key", "span_offset", "media_ref", "frame_seq"
    )


def _ocr_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic tesseract output rows with deterministic dropouts
    ((doc_key+offset)%13==0 missing — models OCR failures)."""
    media = _media_seq(spark, sf_dir)
    ocr = ocr_media(media, use_arrow=False)
    return ocr.where((F.col("doc_key") + F.col("span_offset")) % 13 != 0).select(
        "doc_id",
        F.col("media_ref").alias("frame_name"),
        "frame_seq",
        "ocr_text",
    )


_OCR_ROWS_CTE = f""",
ocr_rows AS (
  SELECT doc_id, media_ref AS frame_name, frame_seq,
         {duckdb_ocr_sql('doc_id', 'media_ref', 'span_offset')} AS ocr_text
  FROM media_rows WHERE (doc_key + span_offset) % 13 <> 0
)"""


# ---------------------------------------------------------------------------
# J1/F9 — strict filename join: frame dropped when its OCR entry is missing
# ---------------------------------------------------------------------------


def q_strict_join_ocr(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = _media_seq(spark, sf_dir).select("doc_id", F.col("media_ref").alias("frame_name"))
    ocr = _ocr_rows(spark, sf_dir).select("doc_id", "frame_name", "ocr_text")
    return frames.join(ocr, ["doc_id", "frame_name"], "inner")


SQL_STRICT_JOIN_OCR = _with(_OCR_ROWS_CTE) + """
SELECT m.doc_id, m.media_ref AS frame_name, o.ocr_text
FROM media_rows m
JOIN ocr_rows o ON o.doc_id = m.doc_id AND o.frame_name = m.media_ref
"""


# ---------------------------------------------------------------------------
# J1 extension-fallback — OCR keyed by .png for half the frames; join on stem
# (reference data/pytorch_dataset.py:448-457 tries stem+{.png,.jpg,.jpeg})
# ---------------------------------------------------------------------------


def q_ext_fallback_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = _media_seq(spark, sf_dir)
    ocr = _ocr_rows(spark, sf_dir).join(
        frames.select("doc_id", F.col("media_ref").alias("frame_name"), "doc_key", "span_offset"),
        ["doc_id", "frame_name"],
    )
    ocr_keyed = ocr.select(
        "doc_id",
        F.when(
            (F.col("doc_key") + F.col("span_offset")) % 2 == 0,
            F.regexp_replace("frame_name", r"\.jpg$", ".png"),
        )
        .otherwise(F.col("frame_name"))
        .alias("ocr_key"),
        "ocr_text",
    )
    stem = lambda c: F.regexp_replace(c, r"\.(jpg|jpeg|png)$", "")  # noqa: E731
    left = frames.select(
        "doc_id",
        F.col("media_ref").alias("frame_name"),
        stem(F.col("media_ref")).alias("frame_stem"),
    )
    right = ocr_keyed.select(
        "doc_id", stem(F.col("ocr_key")).alias("frame_stem"), "ocr_key", "ocr_text"
    )
    return left.join(right, ["doc_id", "frame_stem"], "inner").select(
        "doc_id", "frame_name", "ocr_key", "ocr_text"
    )


SQL_EXT_FALLBACK_JOIN = _with(_OCR_ROWS_CTE) + """,
ocr_keyed AS (
  SELECT o.doc_id,
         CASE WHEN (m.doc_key + m.span_offset) % 2 = 0
              THEN regexp_replace(o.frame_name, '\\.jpg$', '.png')
              ELSE o.frame_name END AS ocr_key,
         o.ocr_text
  FROM ocr_rows o JOIN media_rows m
    ON m.doc_id = o.doc_id AND m.media_ref = o.frame_name
)
SELECT m.doc_id, m.media_ref AS frame_name, k.ocr_key, k.ocr_text
FROM media_rows m
JOIN ocr_keyed k
  ON k.doc_id = m.doc_id
 AND regexp_replace(k.ocr_key, '\\.(jpg|jpeg|png)$', '') =
     regexp_replace(m.media_ref, '\\.(jpg|jpeg|png)$', '')
"""


# ---------------------------------------------------------------------------
# J2 — positional join with min(n_frames, n_llm) truncation
# ---------------------------------------------------------------------------


def q_positional_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = _media_seq(spark, sf_dir)
    n_media = frames.groupBy("doc_id").agg(
        F.count("*").alias("n_media"), F.first("doc_key").alias("doc_key")
    )
    # guard: Spark sequence(0, -1) would generate a DESCENDING array
    n_media = n_media.where((F.col("n_media") - F.col("doc_key") % 2) > 0)
    llm = n_media.select(
        F.col("doc_id").alias("l_doc_id"),
        F.explode(
            F.sequence(
                F.lit(0),
                (F.col("n_media") - 1 - F.col("doc_key") % 2).cast("int"),
            )
        ).alias("pos"),
    )
    llm = llm.select(
        "l_doc_id",
        "pos",
        F.concat(F.lit("v "), F.col("l_doc_id"), F.lit(":"), F.col("pos").cast("string")).alias(
            "llm_val"
        ),
    )
    return frames.join(
        llm,
        (frames["doc_id"] == llm["l_doc_id"]) & (frames["frame_seq"] == llm["pos"]),
        "inner",
    ).select("doc_id", "frame_seq", F.col("media_ref").alias("frame_name"), "llm_val")


SQL_POSITIONAL_JOIN = _with() + """,
n_m AS (
  SELECT doc_id, any_value(doc_key) AS doc_key, count(*) AS n_media
  FROM media_rows GROUP BY doc_id
),
llm AS (
  SELECT doc_id,
         CAST(unnest(range(0, n_media - doc_key % 2)) AS INT) AS pos
  FROM n_m
)
SELECT m.doc_id, m.frame_seq, m.media_ref AS frame_name,
       'v ' || l.doc_id || ':' || CAST(l.pos AS VARCHAR) AS llm_val
FROM media_rows m
JOIN llm l ON l.doc_id = m.doc_id AND l.pos = m.frame_seq
"""


# ---------------------------------------------------------------------------
# J3 — batch-summary broadcast join (every frame gets its batch's summary)
# ---------------------------------------------------------------------------

_FPB = 4


def q_summary_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = seqops.with_batch_id(_media_seq(spark, sf_dir), _FPB)
    summaries = (
        frames.select("doc_id", "batch_id")
        .distinct()
        .select(
            "doc_id",
            "batch_id",
            F.concat(
                F.lit("summary "), F.col("doc_id"), F.lit(" b"), F.col("batch_id").cast("string")
            ).alias("summary"),
        )
    )
    return frames.join(F.broadcast(summaries), ["doc_id", "batch_id"], "inner").select(
        "doc_id", "frame_seq", "batch_id", "summary"
    )


SQL_SUMMARY_BROADCAST = _with() + f"""
SELECT doc_id, frame_seq,
       CAST((frame_seq - (frame_seq % {_FPB})) / {_FPB} AS INT) AS batch_id,
       'summary ' || doc_id || ' b' ||
         CAST(CAST((frame_seq - (frame_seq % {_FPB})) / {_FPB} AS INT) AS VARCHAR) AS summary
FROM media_rows
"""


# ---------------------------------------------------------------------------
# J4 — left join to auxiliary metadata (missing => NULL)
# ---------------------------------------------------------------------------


def q_aux_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/S3/S4: left join to auxiliary metadata. The subtitle probe
    returns the SORTED LIST of subtitle paths (reference
    data/pytorch_dataset.py:179-187 sorted(globs)), emitted portably as a
    '|'-joined string alongside the count."""
    docs = span_rows(spark, sf_dir).select("doc_id", "doc_key").distinct()
    aux = docs.where(F.col("doc_key") % 3 != 1).select(
        "doc_id",
        F.concat(F.lit("meta/"), F.col("doc_id"), F.lit(".info.json")).alias("metadata_path"),
    )
    n_subs = (F.col("doc_key") % 3).cast("int")
    sub_paths = F.array_sort(
        F.transform(
            F.slice(F.array(F.lit("en"), F.lit("es")), 1, n_subs),
            lambda lang: F.concat(
                F.lit("subs/"), F.col("doc_id"), F.lit("."), lang, F.lit(".vtt")
            ),
        )
    )
    return docs.join(aux, "doc_id", "left").select(
        "doc_id",
        "metadata_path",
        n_subs.alias("n_subs"),
        F.array_join(sub_paths, "|").alias("subtitle_paths"),
    )


SQL_AUX_LEFT_JOIN = _with() + """
SELECT DISTINCT doc_id,
       CASE WHEN doc_key % 3 <> 1 THEN 'meta/' || doc_id || '.info.json' END AS metadata_path,
       CAST(doc_key % 3 AS INT) AS n_subs,
       coalesce(array_to_string(
         list_sort(list_transform((['en', 'es'])[1:CAST(doc_key % 3 AS INT)],
                                  lang -> 'subs/' || doc_id || '.' || lang || '.vtt')),
         '|'), '') AS subtitle_paths
FROM span_rows
"""


# ---------------------------------------------------------------------------
# J5/J6 — resume anti-join + checkpoint validity semi-join
# ---------------------------------------------------------------------------

_CK_CTE = """,
ck AS (
  SELECT doc_id, 'done' AS status FROM (SELECT DISTINCT doc_id, doc_key FROM span_rows) WHERE doc_key % 2 = 0
  UNION ALL
  SELECT 'stale_' || CAST(doc_key AS VARCHAR) AS doc_id, 'done' AS status
  FROM (SELECT DISTINCT doc_key FROM span_rows) WHERE doc_key % 50 = 0
)"""


def _ck(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = span_rows(spark, sf_dir).select("doc_id", "doc_key").distinct()
    done = docs.where(F.col("doc_key") % 2 == 0).select("doc_id", F.lit("done").alias("status"))
    stale = (
        docs.select("doc_key")
        .distinct()
        .where(F.col("doc_key") % 50 == 0)
        .select(
            F.concat(F.lit("stale_"), F.col("doc_key").cast("string")).alias("doc_id"),
            F.lit("done").alias("status"),
        )
    )
    return done.unionByName(stale)


def q_resume_pending(spark: SparkSession, sf_dir: str) -> DataFrame:
    flat = span_rows(spark, sf_dir)
    ck = _ck(spark, sf_dir)
    return (
        flat.join(ck.where("status = 'done'").select("doc_id"), "doc_id", "left_anti")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_spans"))
    )


SQL_RESUME_PENDING = _with(_CK_CTE) + """
SELECT s.doc_id, count(*) AS n_spans
FROM span_rows s
WHERE s.doc_id NOT IN (SELECT doc_id FROM ck WHERE status = 'done')
GROUP BY s.doc_id
"""


def q_checkpoint_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = span_rows(spark, sf_dir).select("doc_id").distinct()
    ck = _ck(spark, sf_dir)
    return ck.join(docs, "doc_id", "left_semi").select("doc_id", "status")


SQL_CHECKPOINT_SEMI = _with(_CK_CTE) + """
SELECT doc_id, status FROM ck
WHERE doc_id IN (SELECT DISTINCT doc_id FROM span_rows)
"""


# ---------------------------------------------------------------------------
# F10 — batch structural validation (length-mismatched task lists dropped)
# ---------------------------------------------------------------------------


def q_batch_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = seqops.with_batch_id(_media_seq(spark, sf_dir), _FPB)
    sizes = frames.groupBy("doc_id", "batch_id").agg(
        F.count("*").alias("n_task1"),
        F.first("doc_key").alias("doc_key"),
    )
    sized = sizes.select(
        "doc_id",
        "batch_id",
        "n_task1",
        # task3 loses one element in "corrupt" batches
        F.when(
            (F.col("doc_key") + F.col("batch_id")) % 7 == 0, F.col("n_task1") - 1
        )
        .otherwise(F.col("n_task1"))
        .alias("n_task3"),
        # task5 summary missing in others
        F.when(
            (F.col("doc_key") + F.col("batch_id")) % 11 == 0,
            F.lit(None).cast("string"),
        )
        .otherwise(F.concat(F.lit("s"), F.col("batch_id").cast("string")))
        .alias("task5_summary"),
    )
    return sized.where(
        (F.col("n_task1") == F.col("n_task3")) & F.col("task5_summary").isNotNull()
    ).select("doc_id", "batch_id", "n_task1", "task5_summary")


SQL_BATCH_VALIDATION = _with() + f""",
sizes AS (
  SELECT doc_id,
         CAST((frame_seq - (frame_seq % {_FPB})) / {_FPB} AS INT) AS batch_id,
         any_value(doc_key) AS doc_key,
         count(*) AS n_task1
  FROM media_rows GROUP BY 1, 2
),
sized AS (
  SELECT doc_id, batch_id, n_task1,
         CASE WHEN (doc_key + batch_id) % 7 = 0 THEN n_task1 - 1 ELSE n_task1 END AS n_task3,
         CASE WHEN (doc_key + batch_id) % 11 = 0 THEN NULL
              ELSE 's' || CAST(batch_id AS VARCHAR) END AS task5_summary
  FROM sizes
)
SELECT doc_id, batch_id, n_task1, task5_summary
FROM sized WHERE n_task1 = n_task3 AND task5_summary IS NOT NULL
"""


# ---------------------------------------------------------------------------
# U8 — key-priority coalescing
# ---------------------------------------------------------------------------


def q_key_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = _media_seq(spark, sf_dir)
    cands = frames.select(
        "doc_id",
        "frame_seq",
        F.when((F.col("doc_key") + F.col("frame_seq")) % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("t1c "), F.col("frame_seq").cast("string")))
        .alias("task1_cleaned_ocr"),
        F.when((F.col("doc_key") + F.col("frame_seq")) % 4 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("c "), F.col("frame_seq").cast("string")))
        .alias("cleaned_ocr"),
        F.concat(F.lit("t3 "), F.col("frame_seq").cast("string")).alias("task3_cleaned"),
    )
    return cands.select(
        "doc_id",
        "frame_seq",
        F.coalesce("task1_cleaned_ocr", "cleaned_ocr", "task3_cleaned").alias("llm_clean_ocr"),
    )


SQL_KEY_PRIORITY = _with() + """
SELECT doc_id, frame_seq,
       coalesce(
         CASE WHEN (doc_key + frame_seq) % 3 = 0 THEN NULL
              ELSE 't1c ' || CAST(frame_seq AS VARCHAR) END,
         CASE WHEN (doc_key + frame_seq) % 4 = 0 THEN NULL
              ELSE 'c ' || CAST(frame_seq AS VARCHAR) END,
         't3 ' || CAST(frame_seq AS VARCHAR)
       ) AS llm_clean_ocr
FROM media_rows
"""


# ---------------------------------------------------------------------------
# F12 — extraction modes: cleaning_pairs 3-way expansion
# ---------------------------------------------------------------------------


def q_cleaning_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = _media_seq(spark, sf_dir)
    base = frames.select(
        "doc_id",
        "frame_seq",
        F.concat(F.lit("tess "), F.col("frame_seq").cast("string")).alias("tess"),
        F.concat(F.lit("aug1 "), F.col("frame_seq").cast("string")).alias("aug1"),
        F.concat(F.lit("aug2 "), F.col("frame_seq").cast("string")).alias("aug2"),
        F.concat(F.lit("clean "), F.col("frame_seq").cast("string")).alias("clean"),
    )
    pairs = base.select(
        "doc_id",
        "frame_seq",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("variant_id"), F.col("tess").alias("raw"), F.col("clean")),
                F.struct(F.lit(1).alias("variant_id"), F.col("aug1").alias("raw"), F.col("clean")),
                F.struct(F.lit(2).alias("variant_id"), F.col("aug2").alias("raw"), F.col("clean")),
            )
        ).alias("p"),
    )
    return pairs.select(
        "doc_id", "frame_seq", F.col("p.variant_id").alias("variant_id"),
        F.col("p.raw").alias("raw"), F.col("p.clean").alias("clean")
    )


SQL_CLEANING_PAIRS = _with() + """,
base AS (
  SELECT doc_id, frame_seq,
         'tess ' || CAST(frame_seq AS VARCHAR) AS tess,
         'aug1 ' || CAST(frame_seq AS VARCHAR) AS aug1,
         'aug2 ' || CAST(frame_seq AS VARCHAR) AS aug2,
         'clean ' || CAST(frame_seq AS VARCHAR) AS clean
  FROM media_rows
)
SELECT doc_id, frame_seq, 0 AS variant_id, tess AS raw, clean FROM base
UNION ALL
SELECT doc_id, frame_seq, 1 AS variant_id, aug1 AS raw, clean FROM base
UNION ALL
SELECT doc_id, frame_seq, 2 AS variant_id, aug2 AS raw, clean FROM base
"""


# ---------------------------------------------------------------------------
# A4 — pass counters by status
# ---------------------------------------------------------------------------


def q_pass_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = span_rows(spark, sf_dir)
    per_doc = docs.groupBy("doc_id").agg(
        F.first("doc_key").alias("doc_key"),
        F.sum(F.when(F.col("kind") == "media", 1).otherwise(0)).alias("frames"),
    )
    with_status = per_doc.select(
        "doc_id",
        "frames",
        F.when(F.col("doc_key") % 17 == 0, "failed")
        .when(F.col("doc_key") % 13 == 0, "no_video")
        .otherwise("success")
        .alias("status"),
    )
    return with_status.groupBy("status").agg(
        F.count("*").alias("n_docs"),
        F.sum("frames").alias("frames_saved"),
    )


SQL_PASS_COUNTERS = _with() + """,
per_doc AS (
  SELECT doc_id, any_value(doc_key) AS doc_key,
         sum(CASE WHEN kind = 'media' THEN 1 ELSE 0 END) AS frames
  FROM span_rows GROUP BY doc_id
)
SELECT CASE WHEN doc_key % 17 = 0 THEN 'failed'
            WHEN doc_key % 13 = 0 THEN 'no_video'
            ELSE 'success' END AS status,
       count(*) AS n_docs,
       CAST(sum(frames) AS BIGINT) AS frames_saved
FROM per_doc GROUP BY 1
"""


# ---------------------------------------------------------------------------
# A5/A6/T9 — tiered cost per doc + corpus cost stats
# ---------------------------------------------------------------------------

_TIER_THRESHOLD = 800  # chars/4 => tokens; small threshold so both tiers occur


def _doc_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = span_rows(spark, sf_dir).where("kind = 'text'")
    # floor() on both sides — DuckDB CAST(double AS BIGINT) rounds, Spark truncates
    per_doc = docs.groupBy("doc_id").agg(
        F.floor(F.sum(F.length("text")) / 4).cast("bigint").alias("tokens_in")
    )
    return per_doc.select(
        "doc_id",
        "tokens_in",
        F.floor(F.col("tokens_in") / 3).cast("bigint").alias("tokens_out"),
        F.when(F.col("tokens_in") > _TIER_THRESHOLD, F.lit(250)).otherwise(F.lit(125)).alias("rate_in"),
        F.when(F.col("tokens_in") > _TIER_THRESHOLD, F.lit(1500)).otherwise(F.lit(1000)).alias("rate_out"),
    ).select(
        "doc_id",
        "tokens_in",
        (
            (F.col("tokens_in") * F.col("rate_in") + F.col("tokens_out") * F.col("rate_out"))
            / F.lit(100000000.0)
        ).alias("cost_usd"),
    )


_DOC_COST_CTE = f""",
doc_cost AS (
  SELECT doc_id, tokens_in,
         (tokens_in * (CASE WHEN tokens_in > {_TIER_THRESHOLD} THEN 250 ELSE 125 END)
          + CAST(floor(tokens_in / 3) AS BIGINT) * (CASE WHEN tokens_in > {_TIER_THRESHOLD} THEN 1500 ELSE 1000 END)
         ) / 100000000.0 AS cost_usd
  FROM (
    SELECT doc_id, CAST(floor(sum(length(text)) / 4) AS BIGINT) AS tokens_in
    FROM span_rows WHERE kind = 'text' GROUP BY doc_id
  )
)"""


def q_doc_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _doc_cost(spark, sf_dir).select(
        "doc_id", "tokens_in", F.round("cost_usd", 8).alias("cost_usd")
    )


SQL_DOC_COST = _with(_DOC_COST_CTE) + """
SELECT doc_id, tokens_in, round(cost_usd, 8) AS cost_usd FROM doc_cost
"""


def q_cost_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # np.std in the reference is population sigma -> stddev_pop (SURVEY A6)
    return _doc_cost(spark, sf_dir).agg(
        F.round(F.sum("cost_usd"), 6).alias("total_cost"),
        F.round(F.avg("cost_usd"), 6).alias("mean_cost"),
        F.round(F.stddev_pop("cost_usd"), 6).alias("std_cost"),
        F.round(F.min("cost_usd"), 6).alias("min_cost"),
        F.round(F.max("cost_usd"), 6).alias("max_cost"),
    )


SQL_COST_STATS = _with(_DOC_COST_CTE) + """
SELECT round(sum(cost_usd), 6) AS total_cost,
       round(avg(cost_usd), 6) AS mean_cost,
       round(stddev_pop(cost_usd), 6) AS std_cost,
       round(min(cost_usd), 6) AS min_cost,
       round(max(cost_usd), 6) AS max_cost
FROM doc_cost
"""


# ---------------------------------------------------------------------------
# T9 full pricing semantics — model dict + tiers + substring fallback
# (reference llm/utils/costing.py:5-150; functions/costing.py rebuild)
# ---------------------------------------------------------------------------

_COST_MODELS = [
    "gemini-2.5-pro-preview-05-06",  # known, tiered @200k
    "gemini-1.5-pro-latest",  # known, tiered @128k
    "gemini-2.0-flash-latest",  # known, untiered
    "gemini-1.5-flash-8b-latest",  # known, tiered @128k
    "gemini-2.5-pro-exp-99",  # unknown -> 2.5-pro fallback
    "custom-pro-v1",  # unknown -> 1.5-pro fallback
    "my-2.0-flash-custom",  # unknown -> 2.0-flash fallback
    "mystery-model-9",  # no pricing -> 0.0
]


def q_cost_tiered_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc tiered cost with the full reference semantics: pricing
    dict as a broadcast dimension join, per-model token thresholds,
    base-model substring fallback, missing pricing or missing token
    counts => 0.0. Token counts are scaled to straddle both the 128k and
    200k thresholds; every doc_key%23==0 row has NULL tokens."""
    from .functions.costing import with_cost

    docs = span_rows(spark, sf_dir).where("kind = 'text'")
    per_doc = docs.groupBy("doc_id").agg(
        F.first("doc_key").alias("doc_key"),
        F.floor(F.sum(F.length("text")) / 4).cast("bigint").alias("base_tokens"),
    )
    model = F.element_at(
        F.array(*[F.lit(m) for m in _COST_MODELS]),
        (F.col("doc_key") % 8 + 1).cast("int"),
    )
    null_toks = F.col("doc_key") % 23 == 0
    in_tok = F.when(null_toks, F.lit(None).cast("bigint")).otherwise(
        F.col("base_tokens") + (F.col("doc_key") % 4) * 90000
    )
    shaped = per_doc.select(
        "doc_id",
        model.alias("model"),
        in_tok.alias("input_tokens"),
        F.floor(in_tok / 3).cast("bigint").alias("output_tokens"),
    )
    costed = with_cost(shaped, spark)
    return costed.select(
        "doc_id", "model", "input_tokens", "output_tokens",
        F.round("cost_usd", 9).alias("cost_usd"),
    )


def _cost_tiered_sql() -> str:
    from .functions.costing import cost_sql, resolve_model_sql

    models = ", ".join(f"'{m}'" for m in _COST_MODELS)
    pricing_cte, cost_expr = cost_sql("shaped.input_tokens", "shaped.output_tokens")
    return _with() + f""",
per_doc AS (
  SELECT doc_id, any_value(doc_key) AS doc_key,
         CAST(floor(sum(length(text)) / 4) AS BIGINT) AS base_tokens
  FROM span_rows WHERE kind = 'text' GROUP BY doc_id
),
shaped AS (
  SELECT doc_id,
         (ARRAY[{models}])[CAST(doc_key % 8 + 1 AS INT)] AS model,
         CASE WHEN doc_key % 23 = 0 THEN NULL
              ELSE base_tokens + (doc_key % 4) * 90000 END AS input_tokens,
         CASE WHEN doc_key % 23 = 0 THEN NULL
              ELSE CAST(floor((base_tokens + (doc_key % 4) * 90000) / 3) AS BIGINT) END AS output_tokens
  FROM per_doc
),
{pricing_cte.strip()}
SELECT shaped.doc_id, shaped.model, shaped.input_tokens, shaped.output_tokens,
       round({cost_expr}, 9) AS cost_usd
FROM shaped LEFT JOIN pricing p
  ON p.model = ({resolve_model_sql('shaped.model')})
"""


SQL_COST_TIERED_MODELS = _cost_tiered_sql()


# ---------------------------------------------------------------------------
# A7/S8 — per-doc ordered OCR rollup (map-shaped, emitted portably as text)
# ---------------------------------------------------------------------------


def q_ocr_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ocr = _ocr_rows(spark, sf_dir)
    entry = F.concat(F.col("frame_name"), F.lit("="), F.substring(F.col("ocr_text"), 1, 12))
    return (
        ocr.withColumn("_e", entry)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("frame_seq", "_e"))),
                    lambda s: s["_e"],
                ),
                "|",
            ).alias("ocr_map")
        )
    )


SQL_OCR_ROLLUP = _with(_OCR_ROWS_CTE) + """
SELECT doc_id,
       string_agg(frame_name || '=' || substr(ocr_text, 1, 12), '|' ORDER BY frame_seq) AS ocr_map
FROM ocr_rows GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# W5 — densify frame indices 0..max with '' gap fill
# ---------------------------------------------------------------------------


def q_densify(spark: SparkSession, sf_dir: str) -> DataFrame:
    kept = _ocr_rows(spark, sf_dir).select("doc_id", "frame_seq", F.col("ocr_text").alias("text"))
    return densify_frames(kept, seq_col="frame_seq", value_cols=("text",)).select(
        "doc_id", "frame_seq", "text"
    )


SQL_DENSIFY = _with(_OCR_ROWS_CTE) + """,
spine AS (
  SELECT doc_id, CAST(unnest(range(0, mx + 1)) AS INT) AS frame_seq
  FROM (SELECT doc_id, max(frame_seq) AS mx FROM ocr_rows GROUP BY doc_id)
)
SELECT s.doc_id, s.frame_seq, coalesce(o.ocr_text, '') AS text
FROM spine s LEFT JOIN ocr_rows o
  ON o.doc_id = s.doc_id AND o.frame_seq = s.frame_seq
"""


QUERIES: dict[str, tuple] = {
    "strict_join_ocr": (q_strict_join_ocr, SQL_STRICT_JOIN_OCR),
    "ext_fallback_join": (q_ext_fallback_join, SQL_EXT_FALLBACK_JOIN),
    "positional_join": (q_positional_join, SQL_POSITIONAL_JOIN),
    "summary_broadcast": (q_summary_broadcast, SQL_SUMMARY_BROADCAST),
    "aux_left_join": (q_aux_left_join, SQL_AUX_LEFT_JOIN),
    "resume_pending": (q_resume_pending, SQL_RESUME_PENDING),
    "checkpoint_semi": (q_checkpoint_semi, SQL_CHECKPOINT_SEMI),
    "batch_validation": (q_batch_validation, SQL_BATCH_VALIDATION),
    "key_priority": (q_key_priority, SQL_KEY_PRIORITY),
    "cleaning_pairs": (q_cleaning_pairs, SQL_CLEANING_PAIRS),
    "pass_counters": (q_pass_counters, SQL_PASS_COUNTERS),
    "doc_cost": (q_doc_cost, SQL_DOC_COST),
    "cost_stats": (q_cost_stats, SQL_COST_STATS),
    "cost_tiered_models": (q_cost_tiered_models, SQL_COST_TIERED_MODELS),
    "ocr_rollup": (q_ocr_rollup, SQL_OCR_ROLLUP),
    "densify_frames": (q_densify, SQL_DENSIFY),
}
