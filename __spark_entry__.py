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
    # -- tier 1: round-6 code changes ------------------------------------
    # brand new this round (zero driver rows)
    "corpus_prep_final", "semantic_dedup_incremental",
    "semantic_dedup_incremental_stats",
    # oracle/arithmetic fixed after their r5 row (NULL-safe best-of
    # oracle; integer mixture arithmetic both engines)
    "dedup_best_of_cluster", "mixture_epochs", "mixture_expand",
    # trainer-sharing knob refactor touched these plans' construction
    "semantic_dedup", "semantic_dedup_stats",
    "cluster_prototypes", "semantic_prep",
    # -- tier 2: latest driver row is r2 (oldest evidence; per the r5
    # verdict the stale cohort heads the rotation this round)
    "ngram_jaccard", "minhash_sig", "minhash_lsh", "minhash_lsh_stats",
    "minhash_jaccard_verify", "dedup_exact", "dedup_corpus",
    "near_dup_components", "token_stats", "length_percentiles",
    "top_terms", "quality_score", "lang_id", "doc_fingerprint",
    "ann_cosine_topk", "ann_ivf_assign",
    "sample_k", "slice_window", "batch_stats", "batch_assemble",
    "dedup_encode", "fref_decode", "same_as_prev", "strict_join_ocr",
    "ext_fallback_join", "positional_join", "summary_broadcast",
    "aux_left_join", "resume_pending", "checkpoint_semi",
    "batch_validation", "key_priority", "cleaning_pairs", "pass_counters",
    "doc_cost", "cost_stats", "cost_tiered_models", "ocr_rollup",
    "densify_frames", "allowlist_filter",
    # -- tier 3: latest driver row is r3
    "kmeans_step", "ann_recall", "ann_lsh_bucket", "embedding_near_dup_lsh",
    "events_json_props", "events_pivot", "events_funnel",
    "dedup_cross_source", "skew_stats", "fps_filter",
    "flagship_extract", "span_seq", "ocr_clean", "media_frames",
    # -- tier 4: green in r4/r5 (the registry default order appends the rest)
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
