"""End-to-end dataset_sample composition vs a direct in-process run of the
reference loader semantics (data/pytorch_dataset.py:280-625) on the same
synthetic corpus — including byte parity of the augmented text column,
which the SQL oracle cannot express. Also pins the S12 export wiring."""

from __future__ import annotations

import hashlib
import json
import shutil
import tempfile

import duckdb

from ocr_dataset_builder_spark import synth
from ocr_dataset_builder_spark.functions.cleanup import clean_ocr_text
from ocr_dataset_builder_spark.operators.augment import apply_setting
from ocr_dataset_builder_spark.operators.frame_dedup import (
    SAME_AS_PREVIOUS,
    decode_fref_list,
)
from ocr_dataset_builder_spark.queries_dataset import dataset_samples

_FPB = 4


def _h60(doc_id: str, span_offset: int, salt: int) -> int:
    return int(
        hashlib.md5(f"{doc_id}:{span_offset}:{salt}".encode()).hexdigest()[:15], 16
    )


def loader_oracle(sf_dir: str) -> dict[tuple, dict]:
    """Pure-Python rerun of the loader composition: per video, build the
    tesseract dict and the batch-validated aggregated LLM lists, then walk
    frames positionally with the strict tesseract filter, reconstruct F:i
    refs against the FILTERED list, forward-fill SAME_AS_PREVIOUS, clean,
    coalesce, and augment — the exact reference control flow, one dict per
    sample keyed by (video_id, sample_idx)."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    rows = con.sql(
        f"WITH {synth.DUCKDB_SPANS_CTE} "
        "SELECT doc_id, doc_key, span_offset, media_ref FROM span_rows "
        "WHERE kind = 'media' ORDER BY doc_id, span_offset"
    ).fetchall()
    per_doc: dict[str, list[tuple]] = {}
    for doc_id, doc_key, off, ref in rows:
        per_doc.setdefault(doc_id, []).append((int(doc_key), int(off), ref))

    samples: dict[tuple, dict] = {}
    for doc_id, frames in per_doc.items():
        doc_key = frames[0][0]

        # tesseract data on disk: dropouts + mixed-extension keys
        tess: dict[str, str] = {}
        for dk, off, ref in frames:
            if (dk + off) % 13 == 0:
                continue
            key = ref[: -len(".jpg")] + ".png" if (dk + off) % 2 == 0 else ref
            tess[key] = f"OCR {doc_id}/{ref}\nline {off % 5}"

        # aggregated LLM lists: valid batches concatenated in order
        task1_vals: list[str] = []
        md_raw: list[str] = []
        summaries: list[str] = []
        batches: list[int] = []
        for b0 in range(0, len(frames), _FPB):
            b = b0 // _FPB
            if (doc_key + b) % 7 == 0 or (doc_key + b) % 11 == 0:
                continue
            for _ in frames[b0 : b0 + _FPB]:
                p = len(task1_vals)
                base = f"content {doc_id} {p // 3}"
                task1_vals.append(
                    base + ("\nextra" if p % 7 == 5 and p % 3 != 0 else "")
                )
                md_raw.append(
                    SAME_AS_PREVIOUS
                    if (doc_key + p) % 6 == 0
                    else f"md {doc_id} {p}"
                )
                summaries.append(f"summary {doc_id} b{b}")
                batches.append(b)

        # W3 producer: F:i encoding of the task1 list
        enc: list[str] = []
        for i, v in enumerate(task1_vals):
            prev = task1_vals[i - 1] if i else None
            if prev is None:
                enc.append(v)
            elif v == prev:
                enc.append(f"F:{i-1}")
            elif v.startswith(prev + "\n"):
                enc.append(f"F:{i-1}" + v[len(prev):])
            else:
                enc.append(v)

        # positional walk + strict tesseract filter (name, then stem+exts)
        kept: list[tuple] = []
        for frame_idx in range(min(len(frames), len(enc))):
            dk, off, ref = frames[frame_idx]
            stem = ref[: -len(".jpg")]
            t = tess.get(ref)
            if t is None:
                for ext in (".png", ".jpg", ".jpeg"):
                    t = tess.get(stem + ext)
                    if t is not None:
                        break
            if t is None:
                continue
            kept.append((frame_idx, dk, off, ref, stem, t))

        # W1 decode + W2 fill against the FILTERED lists
        enc_f = ["" if doc_key % 5 == 0 else enc[k[0]] for k in kept]
        dec = decode_fref_list(enc_f)
        filled: list[str] = []
        last: str | None = None
        for k in kept:
            v = md_raw[k[0]]
            if v == SAME_AS_PREVIOUS:
                filled.append(last if last is not None else "")
            else:
                filled.append(v)
                last = v

        for s_idx, (frame_idx, dk, off, ref, stem, t) in enumerate(kept):
            llm_clean = (
                f"alt {doc_id}:{frame_idx}" if doc_key % 5 == 0 else dec[s_idx]
            )
            sid = _h60(doc_id, off, 42) % 10
            seed = _h60(doc_id, off, 43) % 2**31
            nsubs = doc_key % 3
            samples[(doc_id, s_idx)] = dict(
                video_id=doc_id,
                sample_idx=s_idx,
                frame_name=ref,
                frame_stem=stem,
                frame_path=f"frames/{doc_id}/{ref}",
                batch_id=batches[frame_idx],
                tesseract_ocr=clean_ocr_text(t),
                llm_clean_ocr=llm_clean,
                markdown=filled[s_idx],
                summary=summaries[frame_idx],
                metadata_path=(
                    f"meta/{doc_id}.info.json" if doc_key % 3 != 1 else None
                ),
                subtitle_paths="|".join(
                    sorted(
                        f"subs/{doc_id}.{lang}.vtt" for lang in ["en", "es"][:nsubs]
                    )
                ),
                setting_id=sid,
                aug_seed=seed,
                augmented_llm_clean_ocr=apply_setting(llm_clean, sid, seed),
            )
    return samples


def test_dataset_sample_matches_reference_loader_semantics(spark, sf_dir):
    got_rows = dataset_samples(spark, sf_dir, with_augment=True).collect()
    want = loader_oracle(sf_dir)
    got = {(r["video_id"], r["sample_idx"]): r.asDict() for r in got_rows}
    assert set(got) == set(want)
    for key in sorted(want):
        w, g = want[key], got[key]
        for field, wv in w.items():
            assert g[field] == wv, (key, field, g[field], wv)


def test_dataset_sample_export_standard_roundtrip(spark, sf_dir):
    """S12 wiring: export_standard over the composed samples writes one
    JSON record per sample with the canonical field set."""
    from ocr_dataset_builder_spark.sources.jsonl import STANDARD_COLS, export_standard

    df = dataset_samples(spark, sf_dir, with_augment=True)
    n = df.count()
    out = tempfile.mkdtemp(prefix="odb_export_")
    try:
        export_standard(df, out)
        back = spark.read.json(out)
        assert back.count() == n
        assert set(STANDARD_COLS) <= set(back.columns)
        # spot-check one record end-to-end against the loader oracle
        want = loader_oracle(sf_dir)
        r = back.orderBy("doc_id", "frame_path").first()
        match = [
            w
            for w in want.values()
            if w["frame_path"] == r["frame_path"] and w["video_id"] == r["doc_id"]
        ]
        assert match, r
        for c in STANDARD_COLS:
            assert r[c] == match[0][c], (c, r[c], match[0][c])
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_dataset_sample_export_cleaning_pairs(spark, sf_dir):
    """S12 mode 2 over the composed samples: one (raw -> clean) record
    per non-null variant — tesseract and the augmented rewrite as raw,
    llm_clean_ocr as the clean target (reference
    docs/TEXT_DATASET_EXTRACTION_GUIDE.md cleaning-pairs mode)."""
    import json as _json
    import os

    from ocr_dataset_builder_spark.sources.jsonl import export_cleaning_pairs

    df = dataset_samples(spark, sf_dir, with_augment=True)
    n = df.count()
    out = tempfile.mkdtemp(prefix="odb_pairs_")
    try:
        export_cleaning_pairs(
            df,
            out,
            raw_cols=["tesseract_ocr", "augmented_llm_clean_ocr"],
            clean_col="llm_clean_ocr",
        )
        recs = []
        for fn in os.listdir(out):
            if fn.endswith(".json"):
                with open(os.path.join(out, fn)) as f:
                    recs += [_json.loads(line) for line in f if line.strip()]
        assert len(recs) == 2 * n  # both variants present on every sample
        assert {r["variant_id"] for r in recs} == {0, 1}
        by_key = {}
        for r in recs:
            by_key.setdefault((r["doc_id"], r["frame_path"]), set()).add(
                r["variant_id"]
            )
        assert all(v == {0, 1} for v in by_key.values())
        want = loader_oracle(sf_dir)
        sample = recs[0]
        match = [
            w for w in want.values() if w["frame_path"] == sample["frame_path"]
        ][0]
        raw_field = (
            "tesseract_ocr" if sample["variant_id"] == 0 else "augmented_llm_clean_ocr"
        )
        assert sample["raw"] == match[raw_field]
        assert sample["clean"] == match["llm_clean_ocr"]
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_dataset_sample_assign_only_path(spark, sf_dir):
    """with_augment=False stops at U6: with the W1 decode now an in-row
    JVM fold, the assign-only plan has NO Python stage at all, and the
    full plan keeps exactly one (the augment rewrite)."""
    df = dataset_samples(spark, sf_dir, with_augment=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_python = plan.count("MapInPandas")
    assert n_python == 0, plan
    full_plan = (
        dataset_samples(spark, sf_dir, with_augment=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert full_plan.count("MapInPandas") == 1, full_plan  # augment only
    rows = {(r["video_id"], r["sample_idx"]): r for r in df.collect()}
    want = loader_oracle(sf_dir)
    assert set(rows) == set(want)
    for key, w in want.items():
        assert rows[key]["setting_id"] == w["setting_id"]
        assert rows[key]["aug_seed"] == w["aug_seed"]
        assert rows[key]["llm_clean_ocr"] == w["llm_clean_ocr"]
