"""Pipeline-mode knobs: persist (single corpus scan) and reliable
checkpointing must change the execution strategy, never the result."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from ocr_dataset_builder_spark.queries_corpus import (
    connected_components,
    q_dedup_corpus,
    q_minhash_jaccard_verify,
)


def test_persist_knobs_do_not_change_results(spark, sf_dir):
    base = sorted(r["doc_id"] for r in q_dedup_corpus(spark, sf_dir).collect())
    persisted = sorted(
        r["doc_id"]
        for r in q_dedup_corpus(
            spark, sf_dir, storage_level="MEMORY_AND_DISK"
        ).collect()
    )
    assert base == persisted

    v0 = sorted(map(tuple, q_minhash_jaccard_verify(spark, sf_dir).collect()))
    v1 = sorted(
        map(
            tuple,
            q_minhash_jaccard_verify(
                spark, sf_dir, storage_level="MEMORY_AND_DISK"
            ).collect(),
        )
    )
    assert v0 == v1


def test_reliable_checkpoint_requires_dir_and_matches_local(spark):
    edges = spark.createDataFrame(
        [("1", "2"), ("2", "3"), ("7", "8")], "a_id string, b_id string"
    )
    local = sorted(map(tuple, connected_components(edges).collect()))

    had_dir = not spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty()
    if not had_dir:
        with pytest.raises(ValueError, match="setCheckpointDir"):
            connected_components(edges, use_reliable_checkpoint=True)

    d = tempfile.mkdtemp(prefix="odb_ckpt_")
    try:
        spark.sparkContext.setCheckpointDir(d)
        reliable = sorted(
            map(
                tuple,
                connected_components(edges, use_reliable_checkpoint=True).collect(),
            )
        )
        assert reliable == local == [
            ("1", "1"), ("2", "1"), ("3", "1"), ("7", "7"), ("8", "7")
        ]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_corpus_prep_persist_knob(spark, sf_dir):
    """The storage_level knob must not change results (driver compares
    the pure form; callers opt in for the single-scan shingle shape)."""
    from ocr_dataset_builder_spark.queries_quality import q_corpus_prep

    pure = sorted(map(tuple, q_corpus_prep(spark, sf_dir).collect()))
    knob = sorted(
        map(
            tuple,
            q_corpus_prep(
                spark, sf_dir, storage_level="MEMORY_AND_DISK"
            ).collect(),
        )
    )
    assert pure == knob


def test_corpus_prep_budget_persist_matches_pure(spark, sf_dir):
    from ocr_dataset_builder_spark.queries_quality import q_corpus_prep_budget

    pure = sorted(map(tuple, q_corpus_prep_budget(spark, sf_dir).collect()))
    knob = sorted(
        map(
            tuple,
            q_corpus_prep_budget(
                spark, sf_dir, storage_level="MEMORY_AND_DISK"
            ).collect(),
        )
    )
    assert pure == knob
