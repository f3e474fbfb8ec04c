"""corpus_prep_final — cross-stage composition pins.

The point of the composed deliverable is that drift BETWEEN proven
stages can't hide (a budget counting tokens the substring pass removed,
a fill candidate the semantic pass dropped, an epoch plan sized on raw
tokens). These tests re-derive the whole chain in plain Python — the
substring stage via the naive ``_brute_force_spans`` oracle, the
selection/epoch/order arithmetic from scratch — using only
independently-proven queries (decontaminate, semantic_prep,
quality_score) as inputs, and compare the final row set exactly.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

import pytest

from ocr_dataset_builder_spark.queries_corpus import (
    q_quality_score,
    q_semantic_prep,
)
from ocr_dataset_builder_spark.queries_final import q_corpus_prep_final
from ocr_dataset_builder_spark.queries_quality import (
    _MAX_EPOCHS,
    _PACK_CAP,
    _PROBE_MOD,
    _SHUF_SEED,
    _TBS_FRAC,
    q_decontaminate,
)
from ocr_dataset_builder_spark.queries_substr import _SUBSTR_W


def _hex15_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _expected_rows(spark, sf_dir):
    """Full Python re-derivation of the composed chain. Returns
    (rows, diagnostics) where rows is the exact expected output set."""
    from test_substr_dedup import _brute_force_spans

    from ocr_dataset_builder_spark.queries_corpus import _docs

    docs = {
        r["doc_id"]: (r["source"], r["text"])
        for r in _docs(spark, sf_dir).select("doc_id", "source", "text").collect()
    }
    contaminated = {
        r["doc_id"]
        for r in q_decontaminate(spark, sf_dir).collect()
        if r["contaminated"]
    }
    # stage 1+2: decontaminate -> python-md5 exact canonicals
    norm_of = {
        i: re.sub(r"\s+", " ", t.lower()).strip() for i, (_s, t) in docs.items()
    }
    canon_of: dict[str, int] = {}
    for doc_id in sorted(docs):
        if doc_id % _PROBE_MOD == 0 or doc_id in contaminated:
            continue
        canon_of.setdefault(
            hashlib.md5(norm_of[doc_id].encode()).hexdigest(), doc_id
        )
    canon = sorted(canon_of.values())
    # stage 3: naive keep-first substring removal over the CANON set
    _dup, _rem, kept_text = _brute_force_spans(
        {i: norm_of[i].split(" ") for i in canon}, _SUBSTR_W
    )
    n_kept = {
        i: (len(kept_text[i].split(" ")) if kept_text[i] != "" else 0)
        for i in canon
    }
    alive = [i for i in canon if n_kept[i] > 0]
    # stage 4: semantic keep (verdicts from the proven query; docs
    # without an embedding pass)
    sem = {
        r["vec_id"]: r["keep"] for r in q_semantic_prep(spark, sf_dir).collect()
    }
    alive = [i for i in alive if sem.get(i, True)]
    # stage 5: budget fill over POST-REMOVAL tokens
    qual = {
        r["doc_id"]: r["quality"] for r in q_quality_score(spark, sf_dir).collect()
    }
    per_src = defaultdict(list)
    for i in alive:
        if qual[i] is not None:
            per_src[docs[i][0]].append((i, n_kept[i], qual[i]))
    kept: dict[int, int] = {}
    for s, rows in per_src.items():
        budget = math.floor(_TBS_FRAC * sum(n for _i, n, _q in rows))
        taken = 0
        for i, n, q in sorted(rows, key=lambda t: (-t[2], t[0])):
            if taken < budget:
                kept[i] = n
                taken += n
    # stage 6: mixture-epochs integer plan over the kept corpus
    avail = defaultdict(int)
    for i, n in kept.items():
        avail[docs[i][0]] += n
    weight = {s: _hex15_py(s) % 9000 + 1000 for s in avail}
    tt, tw = sum(avail.values()), sum(weight.values())
    stream = []
    for i, n in kept.items():
        s = docs[i][0]
        target = tt * weight[s] // tw
        raw_fe = target // avail[s]
        fe = min(raw_fe, _MAX_EPOCHS)
        residual_ppm = (
            0
            if raw_fe >= _MAX_EPOCHS
            else (target - fe * avail[s]) * 1000000 // avail[s]
        )
        epochs = list(range(fe))
        if _hex15_py(str(i)) % 1000000 < residual_ppm:
            epochs.append(fe)
        for ep in epochs:
            stream.append((i, s, ep, n))
    # stage 6b/7: md5 order + offsets + blocks
    stream.sort(
        key=lambda t: (
            hashlib.md5(f"{_SHUF_SEED}:{t[2]}:{t[0]}".encode()).hexdigest(),
            t[0],
            t[2],
        )
    )
    rows, off = set(), 0
    for pos, (i, s, ep, n) in enumerate(stream):
        first = off // _PACK_CAP
        n_blocks = (off + n - 1) // _PACK_CAP - first + 1
        rows.add((i, s, ep, n, pos, off, first, n_blocks, kept_text[i]))
        off += n
    diag = {
        "canon": canon,
        "n_kept": n_kept,
        "alive": alive,
        "kept": kept,
        "per_src": per_src,
    }
    return rows, diag


@pytest.fixture(scope="module")
def final_rows(spark, sf_dir):
    return [
        (
            r["doc_id"],
            r["source"],
            r["epoch"],
            r["n_tok"],
            r["shuffle_pos"],
            r["start_off"],
            r["first_block"],
            r["n_blocks"],
            r["kept_text"],
        )
        for r in q_corpus_prep_final(spark, sf_dir).collect()
    ]


def test_final_matches_python_end_to_end(spark, sf_dir, final_rows):
    """The whole composed output equals the from-scratch Python chain,
    row for row and value for value."""
    expect, diag = _expected_rows(spark, sf_dir)
    assert set(final_rows) == expect
    # non-vacuity: the stages bite on this corpus — substring removal
    # and/or the semantic verdict dropped docs, and the fill dropped
    # candidates in both directions
    assert len(diag["alive"]) < len(diag["canon"])
    assert 0 < len(diag["kept"]) < sum(len(v) for v in diag["per_src"].values())


def test_final_budget_counts_post_removal_tokens(spark, sf_dir, final_rows):
    """THE composition pin the round-5 verdict asked for: the fill's
    budget and accounting run over post-removal token counts, and those
    differ from raw counts on this corpus (so the check can't pass
    vacuously)."""
    expect, diag = _expected_rows(spark, sf_dir)
    # n_tok in the output == post-removal count == len(kept_text tokens)
    for doc_id, _s, _e, n_tok, *_rest, kept_text in final_rows:
        assert n_tok == len(kept_text.split(" ")), doc_id
        assert n_tok == diag["n_kept"][doc_id], doc_id
    # the substring stage removed tokens from candidate docs, so a
    # raw-token budget would differ from the post-removal budget for at
    # least one source — proving the test distinguishes the two
    from ocr_dataset_builder_spark.queries_corpus import _docs

    raw_tok = {
        r["doc_id"]: len(
            re.sub(r"\s+", " ", r["text"].lower()).strip().split(" ")
        )
        for r in _docs(spark, sf_dir).select("doc_id", "text").collect()
    }
    budgets_differ = False
    for s, rows in diag["per_src"].items():
        post = math.floor(_TBS_FRAC * sum(n for _i, n, _q in rows))
        raw = math.floor(_TBS_FRAC * sum(raw_tok[i] for i, _n, _q in rows))
        if post != raw:
            budgets_differ = True
    assert budgets_differ


def test_final_offsets_and_order(final_rows):
    """Stream discipline: shuffle_pos dense 0..N-1; start_off is the
    exact prefix sum in shuffle_pos order; block spans consistent; the
    order key is md5(seed:epoch:doc_id)."""
    rows = sorted(final_rows, key=lambda t: t[4])
    assert [r[4] for r in rows] == list(range(len(rows)))
    off = 0
    prev_key = None
    for doc_id, _s, epoch, n_tok, _pos, start, first, n_blocks, _t in rows:
        assert start == off
        assert first == start // _PACK_CAP
        assert n_blocks == (start + n_tok - 1) // _PACK_CAP - first + 1
        key = (
            hashlib.md5(f"{_SHUF_SEED}:{epoch}:{doc_id}".encode()).hexdigest(),
            doc_id,
            epoch,
        )
        if prev_key is not None:
            assert prev_key < key
        prev_key = key
        off += n_tok
    # the expansion is real: at least one doc appears in >1 epoch
    from collections import Counter

    per_doc = Counter(r[0] for r in rows)
    assert max(per_doc.values()) > 1


def test_final_centroids_knob_matches_pure(spark, sf_dir, final_rows):
    """Sharing a held trained-centroid relation with the semantic stage
    must not change the composed output."""
    from ocr_dataset_builder_spark import queries_corpus as qc

    cent = qc._trained_centroids(spark, sf_dir)[1].persist()
    cent.count()
    try:
        held = [
            (
                r["doc_id"],
                r["source"],
                r["epoch"],
                r["n_tok"],
                r["shuffle_pos"],
                r["start_off"],
                r["first_block"],
                r["n_blocks"],
                r["kept_text"],
            )
            for r in q_corpus_prep_final(spark, sf_dir, centroids=cent).collect()
        ]
        assert sorted(held) == sorted(final_rows)
    finally:
        cent.unpersist()
