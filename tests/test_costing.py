"""T9/T8 parity: tiered cost + human-readable size vs the REFERENCE
implementation executed directly from /root/reference (same pattern as
test_augment.py — the reference modules are the oracle).
"""

from __future__ import annotations

import importlib.util
import math

import pytest

from ocr_dataset_builder_spark.functions.costing import (
    MODEL_PRICING_ROWS,
    calculate_cost,
    human_size,
)

_COST_PATH = "/root/reference/ocr_dataset_builder/llm/utils/costing.py"
_PROC_PATH = "/root/reference/ocr_dataset_builder/video/processing.py"


def _load_ref_costing():
    spec = importlib.util.spec_from_file_location("ref_costing", _COST_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _load_ref_human_size():
    """processing.py imports cv2 (absent) — exec only the pure
    get_human_readable_size function body."""
    src = open(_PROC_PATH).read()
    start = src.index("def get_human_readable_size")
    end = src.index("\ndef ", start + 1) if "\ndef " in src[start + 1 :] else len(src)
    # function ends at the next top-level statement; the module ends with
    # __main__ block — cut at the first line that is not indented/blank
    lines = src[start:].splitlines()
    body = [lines[0]]
    for ln in lines[1:]:
        if ln and not ln.startswith((" ", "\t", ")")):
            break
        body.append(ln)
    ns = {"math": math}
    exec("\n".join(body), ns)
    return ns["get_human_readable_size"]


_CASES = [
    # (model, input_tokens, output_tokens) — covers every branch:
    ("gemini-2.5-pro-preview-05-06", 100_000, 20_000),  # known, low tier
    ("gemini-2.5-pro-preview-05-06", 300_000, 20_000),  # known, high tier
    ("gemini-2.5-pro-preview-05-06", 200_000, 1),  # exactly at threshold (low)
    ("gemini-2.5-pro-preview-05-06", 200_001, 1),  # one over (high)
    ("gemini-1.5-pro-latest", 128_000, 10),
    ("gemini-1.5-pro-latest", 128_001, 10),
    ("gemini-1.5-flash-latest", 1_000, 500),
    ("gemini-2.0-flash-latest", 5_000_000, 1_000_000),  # untiered
    ("gemini-2.0-flash-lite-latest", 42, 7),
    ("gemini-2.5-flash-preview-05-07", 10_000, 3_000),
    ("gemini-1.5-flash-8b-latest", 200_000, 10),  # tiered high @128k
    ("gemini-2.5-pro-exp-42", 250_000, 10),  # fallback -> 2.5-pro
    ("weird-pro-thing", 50_000, 10),  # fallback -> 1.5-pro
    ("acme-2.0-flash-x", 1_000, 10),  # fallback -> 2.0-flash
    ("acme-flash-basic", 1_000, 10),  # fallback -> 1.5-flash (no 2.0)
    ("totally-unknown-model", 1_000, 10),  # no pricing -> 0.0
    ("gemini-1.5-pro-latest", None, 10),  # missing tokens -> 0.0
    ("gemini-1.5-pro-latest", 10, None),
]


def test_cost_parity_vs_reference():
    ref = _load_ref_costing()
    for model, tin, tout in _CASES:
        want = ref.calculate_gemini_cost(model, tin, tout)
        got = calculate_cost(model, tin, tout)
        assert got == pytest.approx(want, abs=0.0), (model, tin, tout)


def test_pricing_rows_match_reference_dict():
    """Every dict entry in the reference maps onto a MODEL_PRICING_ROWS
    row with the same threshold and rates."""
    ref = _load_ref_costing()
    ours = {r[0]: r for r in MODEL_PRICING_ROWS}
    assert set(ours) == set(ref.MODEL_PRICING)
    for name, cfg in ref.MODEL_PRICING.items():
        _, threshold, in_low, out_low, in_high, out_high = ours[name]
        tk = cfg.get("threshold_k")
        if tk:
            assert threshold == tk * 1000, name
            low = cfg[f"<={tk}k"]
            high = cfg[f">{tk}k"]
            assert (in_low, out_low) == (low["input"], low["output"]), name
            assert (in_high, out_high) == (high["input"], high["output"]), name
        else:
            assert threshold is None, name
            assert (in_low, out_low) == (cfg["input"], cfg["output"]), name


def test_human_size_parity_vs_reference():
    ref_fn = _load_ref_human_size()
    sizes = [0, 1, 512, 1023, 1024, 1536, 10_000, 1_048_576, 5_000_000,
             123_456_789, 10**10, 10**13, 3, 999, 2048]
    for s in sizes:
        assert human_size(s) == ref_fn(s), s


def test_human_size_col_matches_python_twin(spark):
    from pyspark.sql import functions as F

    from ocr_dataset_builder_spark.functions.costing import human_size_col

    sizes = [0, 1, 512, 1023, 1025, 1536, 10_000, 1_048_577, 5_000_000,
             123_456_789, 10**10, 10**13]
    df = spark.createDataFrame([(s,) for s in sizes], "size_bytes long")
    got = {
        r["size_bytes"]: r["h"]
        for r in df.select(
            "size_bytes", human_size_col(F.col("size_bytes")).alias("h")
        ).collect()
    }
    for s in sizes:
        assert got[s] == human_size(s), s


def test_resize_dims_matches_reference_arithmetic(spark):
    """F3: dims + interpolation mode per reference
    video/processing.py:163-185 (int() truncation, INTER_AREA on
    downscale), computed as JVM columns."""
    from pyspark.sql import functions as F

    from ocr_dataset_builder_spark.operators.multimodal import (
        INTER_AREA,
        resize_dims,
    )

    cases = [(480, 640), (1080, 1920), (1024, 1024), (1025, 100), (2000, 3000),
             (1, 1), (1024, 1025)]
    max_dim = 1024
    df = spark.createDataFrame(cases, "h int, w int")
    out_h, out_w, interp = resize_dims(F.col("h"), F.col("w"), max_dim)
    got = {
        (r["h"], r["w"]): (r["oh"], r["ow"], r["i"])
        for r in df.select(
            "h", "w", out_h.alias("oh"), out_w.alias("ow"), interp.alias("i")
        ).collect()
    }
    for h, w in cases:
        cur = max(h, w)
        if cur > max_dim:
            scale = max_dim / cur
            want = (int(h * scale), int(w * scale),
                    INTER_AREA if scale < 1.0 else "INTER_LINEAR")
        else:
            want = (h, w, None)
        assert got[(h, w)] == want, (h, w)
