"""Degenerate-corpus behavior: a boilerplate-heavy corpus (every doc
identical) must not blow up the LSH pair expansion — oversized buckets
are dropped, the drop is observable in the stats query, and exact dedup
still catches the duplicates the cap hid from the near-dup path."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from ocr_dataset_builder_spark import queries_corpus as qc

_N_IDENTICAL = 200  # > _LSH_BUCKET_CAP (64)


@pytest.fixture(scope="module")
def degenerate_dir(spark):
    """A documents.parquet where every doc has identical text plus a few
    genuinely unique docs."""
    tmp = tempfile.mkdtemp(prefix="odb_degen_")
    rows = [
        (i, "the same boilerplate text repeated across the whole corpus again and again", "en", "web", 74)
        for i in range(_N_IDENTICAL)
    ] + [
        (1000 + i, f"unique document number {i} with distinct words {i * 7} {i * 13}", "en", "web", 50)
        for i in range(5)
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_lsh_cap_drops_oversized_buckets(spark, degenerate_dir):
    pairs = qc.q_minhash_lsh(spark, degenerate_dir).collect()
    ids = {r["a_id"] for r in pairs} | {r["b_id"] for r in pairs}
    # the 200 identical docs fall in one >cap bucket per band -> dropped;
    # no quadratic 200*199/2 pair expansion survives
    assert not any(i < _N_IDENTICAL for i in ids), sorted(ids)[:10]
    assert len(pairs) < 100


def test_lsh_stats_report_the_drop(spark, degenerate_dir):
    stats = {r["band_id"]: r for r in qc.q_minhash_lsh_stats(spark, degenerate_dir).collect()}
    assert set(stats) == {0, 1, 2, 3}
    for band_id, r in stats.items():
        assert r["n_dropped_buckets"] >= 1, band_id
        assert r["docs_in_dropped"] >= _N_IDENTICAL, band_id


def test_exact_dedup_catches_what_the_cap_hid(spark, degenerate_dir):
    groups = qc.q_dedup_exact(spark, degenerate_dir).collect()
    big = [r for r in groups if r["group_n"] == _N_IDENTICAL]
    assert len(big) == _N_IDENTICAL  # one row per member of the dup group
    assert all(r["canonical_id"] == 0 for r in big)


def test_connected_components_on_known_graph(spark):
    """Chain + separate pair + a long path (exercises multi-iteration
    propagation: min label must travel the full diameter)."""
    from ocr_dataset_builder_spark.queries_corpus import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (23, 24)],
        "a_id bigint, b_id bigint",
    )
    got = {r["doc_id"]: r["comp"] for r in connected_components(edges).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20, 23: 20, 24: 20,
    }


def test_connected_components_long_path(spark):
    """An 80-node path (diameter 79) must converge well inside the
    iteration cap — pointer jumping makes convergence O(log diameter),
    and non-convergence raises instead of silently mislabeling."""
    from ocr_dataset_builder_spark.queries_corpus import connected_components

    n = 80
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a_id bigint, b_id bigint"
    )
    got = {r["doc_id"]: r["comp"] for r in connected_components(edges).collect()}
    assert got == {i: 0 for i in range(n)}


def test_keep_first_hot_fingerprint_at_scale(spark):
    """2,000 identical docs: every window fingerprint carries 2,000
    occurrences — the hot-fp shape that a row_number window would pin on
    one task. The min-struct keep-first form must (a) plan with NO
    Window node and (b) stay exact: one keeper doc, everyone else fully
    removable, the removal count exactly (n_docs-1) * windows_per_doc."""
    import os
    import shutil
    import tempfile

    from ocr_dataset_builder_spark import queries_substr as qs

    n = 2000
    text = "hot boilerplate fingerprint row repeated across every single document here"
    tmp = tempfile.mkdtemp(prefix="odb_hotfp_")
    try:
        spark.createDataFrame(
            [(i, text, "en", "web", len(text)) for i in range(n)],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        removal = qs._removal_starts(spark, tmp)
        plan = removal._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan, plan
        n_tok = len(text.split())
        wins_per_doc = n_tok - qs._SUBSTR_W + 1
        assert removal.count() == (n - 1) * wins_per_doc
        keepers = removal.select("doc_id").distinct().collect()
        assert {r["doc_id"] for r in keepers} == set(range(1, n))  # doc 0 kept
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_substr_dedup_on_degenerate_corpus_is_linear_and_exact(spark, degenerate_dir):
    """All-identical corpus: every window is duplicated, yet the
    substring machinery has NO pair expansion to cap — occurrence lists
    just get long. Keep-first must retain exactly one doc's windows
    (the lowest doc_id) and mark every other doc fully removable."""
    from ocr_dataset_builder_spark import queries_substr as qs

    stats = {
        r["doc_id"]: (r["n_tokens"], r["removed_tokens"])
        for r in qs.q_dedup_substr_keep_first(spark, degenerate_dir).collect()
    }
    identical = {d: v for d, v in stats.items() if d < 1000}
    assert len(identical) == _N_IDENTICAL
    keeper = min(identical)
    assert identical[keeper][1] == 0  # canonical doc keeps everything
    for d, (n_tok, removed) in identical.items():
        if d != keeper:
            assert removed == n_tok, (d, n_tok, removed)  # fully removable


def test_dedup_exact_plan_has_no_window(spark, degenerate_dir):
    """Exact dedup's canonical pick must be a partial agg + join back on
    the fingerprint, never a window over fp — the hot key is the
    fingerprint of the single most duplicated page (this corpus: one fp
    carrying 200 of 205 docs; at crawl scale, 10^6+), and a window pins
    all of them on one task while the agg combines map-side and the
    join AQE-skew-splits."""
    df = qc.q_dedup_exact(spark, degenerate_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "HashAggregate" in plan or "SortAggregate" in plan, plan


def test_best_of_cluster_collapses_identical(spark, degenerate_dir):
    """The 200 identical docs form one group whose members all score the
    same quality -> the doc_id tie-break keeps doc 0; every other copy
    is gone. The 5 unique docs survive as their own singleton groups."""
    rows = qc.q_dedup_best_of_cluster(spark, degenerate_dir).collect()
    kept = sorted(r["doc_id"] for r in rows)
    assert 0 in kept
    assert not any(1 <= d < _N_IDENTICAL for d in kept), kept[:10]
    assert sorted(d for d in kept if d >= 1000) == [1000 + i for i in range(5)]
    by_grp = {r["grp"]: r for r in rows}
    assert len(by_grp) == len(rows)  # one survivor per group
    assert by_grp[0]["n_members"] == 1  # exact dedup collapsed first
