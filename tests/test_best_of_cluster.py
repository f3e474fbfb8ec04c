"""dedup_best_of_cluster: quality-ranked canonical selection.

Invariants pinned against the engine's own building blocks (the DuckDB
oracle pins the values; these pin the SEMANTIC relationships):
  - the group labels are exactly dedup_corpus's min-doc_id survivors
    (one row per duplicate group, same group structure);
  - the kept member is the argmax of quality within the group, ties to
    the smallest doc_id, and n_members counts the group's exact
    canonicals.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ocr_dataset_builder_spark.queries_corpus import (
    SQL_DEDUP_BEST_OF_CLUSTER,
    q_dedup_best_of_cluster,
    q_dedup_corpus,
    q_dedup_exact,
    q_near_dup_components,
    q_quality_score,
)


@pytest.fixture(scope="module")
def whitespace_dir(spark):
    """A corpus containing whitespace-only docs (the q_quality_score
    nchars=0 guard scores them NULL) alongside normal duplicates."""
    tmp = tempfile.mkdtemp(prefix="odb_ws_")
    rows = [
        (1, "   ", "en", "web", 3),
        (2, " \t  ", "en", "web", 4),
        (3, "\t", "en", "web", 1),
        (10, "a perfectly normal document with several words in it", "en", "web", 52),
        (11, "a perfectly normal document with several words in it", "en", "web", 52),
        (12, "another distinct document about something else entirely here", "en", "web", 60),
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_null_quality_group_survives_and_matches_oracle(spark, whitespace_dir):
    """ADVICE r5 (medium): an all-NULL-quality duplicate group must be
    kept by BOTH engines with quality NULL — the oracle's canonical join
    is NULL-safe (IS NOT DISTINCT FROM), so the group no longer drops
    out of the SQL side while the Spark max(struct) keeps it."""
    import duckdb

    got = sorted(
        (r["doc_id"], r["grp"], r["n_members"], r["quality"])
        for r in q_dedup_best_of_cluster(spark, whitespace_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(whitespace_dir, 'documents.parquet')}/*.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(SQL_DEDUP_BEST_OF_CLUSTER).fetchall())
    con.close()
    assert got == want
    # the whitespace-only docs collapse to one exact canonical whose
    # quality is NULL — that group must be present, not silently dropped
    null_rows = [r for r in got if r[3] is None]
    assert len(null_rows) >= 1, got
    assert any(r[0] in (1, 2, 3) for r in null_rows), got


def test_group_labels_match_dedup_corpus(spark, sf_dir):
    best = q_dedup_best_of_cluster(spark, sf_dir).collect()
    corpus_keep = sorted(
        r["doc_id"] for r in q_dedup_corpus(spark, sf_dir).collect()
    )
    assert sorted(r["grp"] for r in best) == corpus_keep
    assert len({r["grp"] for r in best}) == len(best)


def test_picks_argmax_quality_with_id_tiebreak(spark, sf_dir):
    best = {r["grp"]: r for r in q_dedup_best_of_cluster(spark, sf_dir).collect()}
    qual = {
        r["doc_id"]: r["quality"]
        for r in q_quality_score(spark, sf_dir).collect()
    }
    exact = [
        r["doc_id"]
        for r in q_dedup_exact(spark, sf_dir)
        .where(F.col("doc_id") == F.col("canonical_id"))
        .collect()
    ]
    comp = {
        r["doc_id"]: r["comp"]
        for r in q_near_dup_components(spark, sf_dir).collect()
    }
    groups: dict[int, list[int]] = {}
    for d in exact:
        groups.setdefault(comp.get(d, d), []).append(d)
    assert set(groups) == set(best)
    for g, members in groups.items():
        want_q = max(qual[m] for m in members)
        want_id = min(m for m in members if qual[m] == want_q)
        assert best[g]["doc_id"] == want_id, (g, members)
        assert best[g]["quality"] == want_q
        assert best[g]["n_members"] == len(members)
