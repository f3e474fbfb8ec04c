"""Invariants of the composed corpus_prep deliverable and the packing
operator: exact, gap-free global token offsets, and composition safety
(dedup canonicals are elected among the survivors only)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_pack_offsets_are_contiguous(spark, sf_dir):
    from ocr_dataset_builder_spark.queries_quality import q_pack_blocks

    rows = sorted(
        (r["doc_id"], r["n_tok"], r["start_off"], r["first_block"], r["n_blocks"])
        for r in q_pack_blocks(spark, sf_dir).collect()
    )
    off = 0
    cap = 512
    for doc_id, n_tok, start, first, nb in rows:
        assert start == off, (doc_id, start, off)
        assert first == start // cap
        assert nb == (start + n_tok - 1) // cap - first + 1
        off += n_tok
    assert off > 0


def test_corpus_prep_composition_invariants(spark, sf_dir):
    from ocr_dataset_builder_spark.queries_quality import (
        _PROBE_MOD,
        q_corpus_prep,
        q_decontaminate,
        q_stratified_sample,
    )

    prep = q_corpus_prep(spark, sf_dir).collect()
    ids = [r["doc_id"] for r in prep]
    assert len(ids) == len(set(ids))
    # no probe docs, no contaminated docs, all sampled
    assert all(i % _PROBE_MOD != 0 for i in ids)
    contaminated = {
        r["doc_id"]
        for r in q_decontaminate(spark, sf_dir).collect()
        if r["contaminated"]
    }
    assert not (set(ids) & contaminated)
    sampled = {r["doc_id"] for r in q_stratified_sample(spark, sf_dir).collect()}
    assert set(ids) <= sampled
    # offsets contiguous over the SURVIVOR corpus
    rows = sorted((r["doc_id"], r["n_tok"], r["start_off"]) for r in prep)
    off = 0
    for _id, n_tok, start in rows:
        assert start == off
        off += n_tok


def test_decontaminate_paths_equal(spark, sf_dir):
    """Broadcast and keyed-join decontamination produce identical rows;
    the production entry point's size guard selects between them."""
    from ocr_dataset_builder_spark.queries_quality import (
        decontaminate,
        q_decontaminate,
        q_decontaminate_join,
    )

    bc = sorted(map(tuple, q_decontaminate(spark, sf_dir).collect()))
    kj = sorted(map(tuple, q_decontaminate_join(spark, sf_dir).collect()))
    assert bc == kj
    # guard=0 forces the keyed path through the production entry point
    forced = sorted(map(tuple, decontaminate(spark, sf_dir, 0).collect()))
    assert forced == bc


def test_decontaminate_join_has_no_forced_broadcast(spark, sf_dir):
    """The keyed path carries NO broadcast hint: at test scale the
    planner still broadcasts the tiny probe side (correct — the guard
    exists for when it is NOT tiny), so pin the semantics by disabling
    the size-based broadcast: with the hint absent the probe join must
    degrade to a shuffle join, which a forced hint would never do."""
    from ocr_dataset_builder_spark.queries_quality import q_decontaminate_join

    key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "-1")
        plan = (
            q_decontaminate_join(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set(key, prev)
    probe_join = [
        ln for ln in plan.splitlines() if "Join" in ln and "shingle" in ln
    ]
    assert probe_join, plan
    assert not any("Broadcast" in ln for ln in probe_join), probe_join


def test_token_budget_sample_degenerate_uniform(spark, tmp_path):
    """All docs identical (one quality value, equal sizes): the ENTIRE
    source is the cutoff group, so selection runs through the stage-3
    doc_id-ordered two-phase path — expect exactly the first half by
    doc_id."""
    import os

    from ocr_dataset_builder_spark.queries_quality import (
        q_token_budget_sample,
    )

    text = " ".join(f"w{i % 5}" for i in range(40))
    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, text, "en", "web", len(text)) for i in range(10)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    kept = sorted(
        r["doc_id"] for r in q_token_budget_sample(spark, d).collect()
    )
    # budget = floor(0.5 * 10 * 40) = 200; doc k's cum_before = 40k,
    # kept iff 40k < 200 -> k in 0..4
    assert kept == [0, 1, 2, 3, 4]


def test_token_budget_sample_exact_greedy(spark, sf_dir):
    """The kept set equals an independent Python greedy simulation
    EXACTLY per source — including the doc_id tie-split within the
    cutoff quality value (a stage-3 ordering regression, e.g. doc_id
    DESC, cannot hide behind aggregate bounds)."""
    import math
    from collections import defaultdict

    from ocr_dataset_builder_spark.queries_corpus import q_quality_score
    from ocr_dataset_builder_spark.queries_quality import (
        _TBS_FRAC,
        _docs,
        q_token_budget_sample,
    )

    src = {
        r["doc_id"]: r["source"]
        for r in _docs(spark, sf_dir).select("doc_id", "source").collect()
    }
    alldocs = defaultdict(list)
    for r in q_quality_score(spark, sf_dir).collect():
        alldocs[src[r["doc_id"]]].append(
            (r["doc_id"], r["n_tokens"], r["quality"])
        )
    kept = defaultdict(set)
    for r in q_token_budget_sample(spark, sf_dir).collect():
        kept[r["source"]].add(r["doc_id"])
    assert set(kept) == set(alldocs)
    for s, docs in alldocs.items():
        budget = math.floor(_TBS_FRAC * sum(n for _, n, q in docs if q is not None))
        expect, taken = set(), 0
        for i, n, q in sorted(
            (d for d in docs if d[2] is not None),
            key=lambda t: (-t[2], t[0]),
        ):
            if taken < budget:
                expect.add(i)
                taken += n
        assert kept[s] == expect, (s, kept[s] ^ expect)
        assert len(expect) < len(docs), s  # something must drop


def test_token_budget_sample_empty_docs(spark, tmp_path):
    """Zero-character docs: quality_score yields NULL quality (no ANSI
    DIVIDE_BY_ZERO crash — mirrors DuckDB's NULL on x/0), and the
    budget fill excludes them from candidates AND source totals."""
    import os

    from ocr_dataset_builder_spark.queries_corpus import q_quality_score
    from ocr_dataset_builder_spark.queries_quality import (
        q_token_budget_sample,
    )

    text = " ".join(f"w{i % 5} the" for i in range(20))
    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, text, "en", "web", len(text)) for i in range(4)]
        + [(10, "", "en", "web", 0), (11, "   ", "en", "web", 3)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    qual = {r["doc_id"]: r["quality"] for r in q_quality_score(spark, d).collect()}
    assert qual[10] is None and qual[11] is None
    assert all(qual[i] is not None for i in range(4))
    kept = sorted(r["doc_id"] for r in q_token_budget_sample(spark, d).collect())
    # budget = floor(0.5 * 4 * 40) = 80 over scoreable docs only; all
    # scoreable docs tie on quality -> doc_id order -> first two kept
    assert kept == [0, 1]


def test_corpus_prep_budget_exact_sim(spark, sf_dir):
    """Full independent simulation of the composed budget deliverable:
    decontamination survivors (via the proven decontaminate query),
    dedup canonicals re-derived with PYTHON md5 over an independent
    normalization (shares no Spark code with the query under test),
    then the same greedy fill simulation as the token_budget test —
    kept set, per-source budgets, and offset contiguity all exact."""
    import hashlib
    import math
    import re
    from collections import defaultdict

    from ocr_dataset_builder_spark.queries_corpus import q_quality_score
    from ocr_dataset_builder_spark.queries_quality import (
        _PROBE_MOD,
        _TBS_FRAC,
        _docs,
        q_corpus_prep_budget,
        q_decontaminate,
    )

    contaminated = {
        r["doc_id"]
        for r in q_decontaminate(spark, sf_dir).collect()
        if r["contaminated"]
    }
    docs = {
        r["doc_id"]: (r["source"], r["text"])
        for r in _docs(spark, sf_dir).select("doc_id", "source", "text").collect()
    }
    qual = {
        r["doc_id"]: (r["n_tokens"], r["quality"])
        for r in q_quality_score(spark, sf_dir).collect()
    }
    # survivors -> python-md5 dedup canonicals (min doc_id per fp)
    canon_of = {}
    for doc_id in sorted(docs):
        if doc_id % _PROBE_MOD == 0 or doc_id in contaminated:
            continue
        norm = re.sub(r"\s+", " ", docs[doc_id][1].lower()).strip()
        fp = hashlib.md5(norm.encode()).hexdigest()
        canon_of.setdefault(fp, doc_id)
    canon = sorted(canon_of.values())
    per_src = defaultdict(list)
    for doc_id in canon:
        n_tok, q = qual[doc_id]
        if q is not None:
            per_src[docs[doc_id][0]].append((doc_id, n_tok, q))
    expect = {}
    for s, rows in per_src.items():
        budget = math.floor(_TBS_FRAC * sum(n for _, n, _q in rows))
        taken = 0
        for i, n, q in sorted(rows, key=lambda t: (-t[2], t[0])):
            if taken < budget:
                expect[i] = n
                taken += n
    got = sorted(
        (r["doc_id"], r["n_tok"], r["start_off"])
        for r in q_corpus_prep_budget(spark, sf_dir).collect()
    )
    assert {i: n for i, n, _ in got} == expect
    off = 0
    for _i, n_tok, start in got:
        assert start == off
        off += n_tok
    # selection is real in both directions: something dropped, something kept
    assert 0 < len(got) < len(canon)


def test_corpus_shuffle_is_offset_consistent_permutation(spark, sf_dir):
    """shuffle_pos is a bijection onto 0..n-1, start_off is the exact
    token prefix sum in shuffle order, and the order is the seeded hash
    order (re-derived with Python md5 — shares nothing with the plan)."""
    import hashlib

    from ocr_dataset_builder_spark.queries_quality import (
        _SHUF_SEED,
        q_corpus_shuffle,
    )

    rows = q_corpus_shuffle(spark, sf_dir).collect()
    n = len(rows)
    assert sorted(r["shuffle_pos"] for r in rows) == list(range(n))
    by_pos = sorted(rows, key=lambda r: r["shuffle_pos"])
    off = 0
    for r in by_pos:
        assert r["start_off"] == off
        off += r["n_tok"]
    expect_order = sorted(
        (hashlib.md5(f"{_SHUF_SEED}:{r['doc_id']}".encode()).hexdigest(), r["doc_id"])
        for r in rows
    )
    assert [d for _, d in expect_order] == [r["doc_id"] for r in by_pos]


def test_mixture_epochs_cap_and_conservation(spark, tmp_path):
    """A tiny source with a big hash weight hits the _MAX_EPOCHS cap
    (flagged, residual zeroed, effective = cap * avail); an uncapped
    source's effective tokens reproduce its exact target. Column
    arithmetic re-derived in Python from the same definitions."""
    import os

    from ocr_dataset_builder_spark.queries_quality import (
        _MAX_EPOCHS,
        q_mixture_epochs,
    )

    # srcA: 2 docs x 1000 tokens; srcB: 1 doc x 10 tokens. Whatever the
    # hash weights, srcB's target is a large multiple of its 10 tokens
    # unless its weight is < ~1/50 of srcA's — assert from the OUTPUT's
    # own weights so the pin is hash-value-independent.
    long = " ".join("w" for _ in range(1000))
    short = " ".join("w" for _ in range(10))
    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(0, long, "en", "srcA", len(long)), (1, long, "en", "srcA", len(long)),
         (2, short, "en", "srcB", len(short))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    rows = {r["source"]: r for r in q_mixture_epochs(spark, d).collect()}
    tt = sum(r["avail_tok"] for r in rows.values())
    tw = sum(r["weight_bp"] for r in rows.values())
    assert tt == 2010
    for s, r in rows.items():
        assert r["target_tok"] == tt * r["weight_bp"] // tw
        raw_epochs = r["target_tok"] // r["avail_tok"]
        if raw_epochs >= _MAX_EPOCHS:
            assert r["capped"] and r["full_epochs"] == _MAX_EPOCHS
            assert r["residual_ppm"] == 0
            assert r["effective_tok"] == _MAX_EPOCHS * r["avail_tok"]
        else:
            assert not r["capped"] and r["full_epochs"] == raw_epochs
            rem = r["target_tok"] - raw_epochs * r["avail_tok"]
            assert r["residual_ppm"] == rem * 1000000 // r["avail_tok"]
            assert r["effective_tok"] == r["target_tok"]
    # srcB's weight is at least 1000/10000 bp while its avail is 10 of
    # 2010 tokens -> raw epochs >= (2010 * 1000 // tw) // 10, which is
    # >= _MAX_EPOCHS for every possible tw (<= 2 * 9999 + 1000)
    assert rows["srcB"]["capped"]
    assert not rows["srcA"]["capped"]


def test_mixture_expand_matches_plan(spark, tmp_path):
    """The expanded stream realizes the plan exactly: every doc of a
    source appears full_epochs times at epochs 0..full-1, and the
    residual subset (re-derived with Python md5) appears once more at
    epoch = full_epochs. Uses the same skewed corpus as the cap test so
    a capped source is exercised."""
    import hashlib
    import os
    from collections import Counter

    from ocr_dataset_builder_spark.queries_quality import (
        q_mixture_epochs,
        q_mixture_expand,
    )

    long = " ".join("w" for _ in range(1000))
    short = " ".join("w" for _ in range(10))
    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(0, long, "en", "srcA", len(long)), (1, long, "en", "srcA", len(long)),
         (2, short, "en", "srcB", len(short))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    plan = {r["source"]: r for r in q_mixture_epochs(spark, d).collect()}
    got = Counter(
        (r["doc_id"], r["epoch"]) for r in q_mixture_expand(spark, d).collect()
    )
    assert all(v == 1 for v in got.values())  # (doc, epoch) unique
    docs = {0: "srcA", 1: "srcA", 2: "srcB"}
    for doc_id, src in docs.items():
        p = plan[src]
        expect_epochs = set(range(p["full_epochs"]))
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        if h % 1000000 < p["residual_ppm"]:
            expect_epochs.add(p["full_epochs"])
        assert {e for (i, e) in got if i == doc_id} == expect_epochs, doc_id
    # the capped source really repeats: srcB appears exactly cap times
    from ocr_dataset_builder_spark.queries_quality import _MAX_EPOCHS

    assert sum(1 for (i, _e) in got if i == 2) == _MAX_EPOCHS


def test_quality_deciles_degenerate_and_sparse(spark, tmp_path):
    """One source where every doc ties on a single quality value (one
    group must fan out across all 10 deciles — the interval-intersection
    path, not the common case) and one source with fewer docs than
    deciles. Counts pinned against a Python rank simulation."""
    import os
    from collections import Counter

    from ocr_dataset_builder_spark.queries_corpus import q_quality_score
    from ocr_dataset_builder_spark.queries_quality import q_quality_deciles

    same = " ".join("the cat sat" for _ in range(10))
    d = str(tmp_path / "corpus")
    rows = [(i, same, "en", "srcU", len(same)) for i in range(25)]
    rows += [(100 + i, " ".join("word" for _ in range(5 + i * 7)), "en", "srcS",
              40 + i * 35) for i in range(3)]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    qual = {r["doc_id"]: r["quality"] for r in q_quality_score(spark, d).collect()}
    got = {
        (r["source"], r["decile"]): (r["n_docs"], r["min_q"], r["max_q"])
        for r in q_quality_deciles(spark, d).collect()
    }
    for src, ids in (("srcU", range(25)), ("srcS", range(100, 103))):
        docs = sorted((qual[i], i) for i in ids if qual[i] is not None)
        n = len(docs)
        expect = Counter()
        bounds = {}
        for r, (q, _i) in enumerate(docs):
            k = r * 10 // n
            expect[k] += 1
            lo, hi = bounds.get(k, (q, q))
            bounds[k] = (min(lo, q), max(hi, q))
        for k, cnt in expect.items():
            assert got[(src, k)] == (cnt, *bounds[k]), (src, k)
        assert {k for (s, k) in got if s == src} == set(expect)
    # the tie source really exercised the fan-out: all 10 deciles present
    assert {k for (s, k) in got if s == "srcU"} == set(range(10))
