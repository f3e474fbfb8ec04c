"""The Arrow/BLAS assignment backend (production path) pinned against
the oracle-portable fold backend.

The fold path computes each distance as an in-row sequential double
fold (bit-identical to the DuckDB oracle); the arrow path computes the
whole distance matrix per Arrow batch with numpy. Summation order
differs, so d2 may differ in the last ulp — the pin asserts identical
(vec_id, cent_id, rnk) picks on the fixtures and d2 agreement to 1e-9
relative, plus an exact-tie case in integer arithmetic where both
backends must break on cent_id ascending."""

import os

import pytest
from pyspark.sql import functions as F

from ocr_dataset_builder_spark import queries_corpus as qc

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def sf_dir():
    return SF_DIR


def _pairs(df):
    return {
        (r["vec_id"], r["rnk"]): (r["cent_id"], r["d2"])
        for r in df.collect()
    }


@pytest.mark.parametrize("rank_max", [1, 3])
def test_arrow_assign_matches_fold(spark, sf_dir, rank_max):
    e = qc._vectors(spark, sf_dir)
    cent = e.where(F.col("vec_id") % qc._IVF_CENTROID_MOD == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    fold = _pairs(qc._assign_to(e, cent, rank_max, backend="fold"))
    arrow = _pairs(qc._assign_to(e, cent, rank_max, backend="arrow"))
    assert fold.keys() == arrow.keys()
    for key, (fc, fd) in fold.items():
        ac, ad = arrow[key]
        assert fc == ac, f"{key}: fold picked {fc}, arrow {ac}"
        assert ad == pytest.approx(fd, rel=1e-9)


def test_arrow_tie_breaks_on_cent_id(spark):
    # v exactly equidistant (d2 = 2, exactly representable) from both
    # centroids -> both backends must pick the smaller cent_id even
    # though the larger one is listed first
    e = spark.createDataFrame([(1, [0.0, 0.0])], "vec_id bigint, v array<double>")
    cent = spark.createDataFrame(
        [(5, [1.0, 1.0]), (3, [-1.0, -1.0])],
        "cent_id bigint, cv array<double>",
    )
    for backend in ("fold", "arrow"):
        got = qc._assign_to(e, cent, 1, backend=backend).collect()
        assert len(got) == 1 and got[0]["cent_id"] == 3, backend


def test_arrow_trainer_matches_fold_trainer(spark, sf_dir):
    """Full Lloyd loop: same centroids out of both backends on the
    fixture (no near-ties at this scale; a flip would change counts)."""
    _, cf = qc._trained_centroids(spark, sf_dir, backend="fold")
    _, ca = qc._trained_centroids(spark, sf_dir, backend="arrow")
    rows_f = {r["cent_id"]: list(r["cv"]) for r in cf.collect()}
    rows_a = {r["cent_id"]: list(r["cv"]) for r in ca.collect()}
    assert rows_f.keys() == rows_a.keys()
    for cid, vf in rows_f.items():
        assert rows_a[cid] == pytest.approx(vf, rel=1e-9)
