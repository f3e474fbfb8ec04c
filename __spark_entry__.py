"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship span-extraction query on sf0.001.
queries()     -> one callable per implemented operator (SURVEY.md §2).
oracle_sql()  -> DuckDB-equivalent SQL per query (value-level gate).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end ordered span extraction on sf0.001."""
    from ocr_dataset_builder_spark.queries_spans import q_flagship

    return q_flagship(spark, "/root/testdata/sf0.001")


# If the driver caps how many registered queries it value-checks per
# round (50 per round so far), rotation keeps every query covered and —
# per the round-4 verdict — prioritizes by STALENESS OF EVIDENCE, not
# novelty: (1) queries whose code changed since their last driver row
# (including never-checked new ones), (2) queries whose latest green row
# is the oldest, (3) the recently-re-verified rest. A semantics-changing
# edit can then never coast on a stale green row.
_PRIORITY = [
    # -- tier 1: round-7 code changes ------------------------------------
    # backend= threading touched these queries' construction paths (the
    # registered fold defaults are unchanged by intent, which is exactly
    # what a driver row must re-prove): the semantic family, the
    # incremental family (whose fold store-compare also moved into a
    # branch), kmeans_train, the LSH verify, and the composed deliverable
    "semantic_dedup_incremental", "semantic_dedup_incremental_stats",
    "semantic_dedup", "semantic_dedup_stats", "cluster_prototypes",
    "semantic_prep", "kmeans_train", "embedding_near_dup_lsh",
    "corpus_prep_final",
    # -- tier 2: oldest evidence first — augment_profiles' newest row is
    # r1 (!), then the 13 untouched r3-stale queries
    "augment_profiles",
    "kmeans_step", "ann_recall", "ann_lsh_bucket",
    "events_json_props", "events_pivot", "events_funnel",
    "dedup_cross_source", "skew_stats", "fps_filter",
    "flagship_extract", "span_seq", "ocr_clean", "media_frames",
    # -- tier 3: latest driver row is r4 (43 queries; the 50-slot budget
    # reaches ~26 of these after tiers 1-2 — the rest lead round 8)
    "ann_ivf_probe", "ann_ivf_trained", "augment_assign", "bm25_score",
    "boilerplate_phrases", "boilerplate_strip_stats", "corpus_prep",
    "dataset_sample", "decontaminate", "decontaminate_join",
    "distinct_sketch", "doc_chunking", "embedding_label_stats",
    "events_asof_join", "events_hourly", "events_range_join",
    "events_rollup", "events_sessions", "html_blocks",
    "html_content_text", "html_main_text", "layout_reading_order",
    "length_percentiles_agg", "media_sizes", "mixture_stats",
    "multimodal_meta", "pack_blocks", "parse_image_batches", "pii_scrub",
    "quality_filter", "quality_repetition", "refine_frames",
    "refine_summary", "resize_checksum", "resize_dims", "simhash",
    "simhash_near", "simhash_near_stats", "stratified_sample",
    "substr_dup_spans", "tfidf_top_terms", "unigram_logprob",
    # -- tier 4: green in r5/r6 (the registry default order appends the rest)
]


def _registry() -> dict[str, tuple]:
    from ocr_dataset_builder_spark import queries_spans

    reg: dict[str, tuple] = {}
    reg.update(queries_spans.QUERIES)
    for mod in (
        "queries_dataset",
        "queries_joins",
        "queries_corpus",
        "queries_substr",
        "queries_refine",
        "queries_events",
        "queries_html",
        "queries_quality",
        "queries_final",
    ):
        try:
            import importlib

            m = importlib.import_module(f"ocr_dataset_builder_spark.{mod}")
            reg.update(m.QUERIES)
        except ImportError:
            pass
    ordered: dict[str, tuple] = {}
    for name in _PRIORITY:
        if name in reg:
            ordered[name] = reg[name]
    for name, entry in reg.items():
        ordered.setdefault(name, entry)
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in _registry().items() if sql is not None
    }
