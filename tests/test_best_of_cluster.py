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

from pyspark.sql import functions as F

from ocr_dataset_builder_spark.queries_corpus import (
    q_dedup_best_of_cluster,
    q_dedup_corpus,
    q_dedup_exact,
    q_near_dup_components,
    q_quality_score,
)


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
