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


def _registry() -> dict[str, tuple]:
    from ocr_dataset_builder_spark import queries_spans

    reg: dict[str, tuple] = {}
    reg.update(queries_spans.QUERIES)
    for mod in (
        "queries_dataset",
        "queries_joins",
        "queries_corpus",
        "queries_refine",
        "queries_events",
        "queries_html",
    ):
        try:
            import importlib

            m = importlib.import_module(f"ocr_dataset_builder_spark.{mod}")
            reg.update(m.QUERIES)
        except ImportError:
            pass
    return reg


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in _registry().items() if sql is not None
    }
