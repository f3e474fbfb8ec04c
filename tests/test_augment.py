"""Parity of the augmentation rebuild against the reference module executed
directly from /root/reference with patched global seeding (FIXTURES.md
fx_augment). Same seed -> byte-identical output for every primitive and
every profile."""

from __future__ import annotations

import importlib.util
import random

import pytest

from ocr_dataset_builder_spark.operators import augment as mine

_REF_PATH = "/root/reference/ocr_dataset_builder/data/ocr_augmentations.py"


@pytest.fixture(scope="module")
def ref():
    spec = importlib.util.spec_from_file_location("ref_augmentations", _REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


SAMPLES = [
    "This is the first sentence. It is a good sentence.\nSecond line here, with words!\nShort.\nAnd a final line without punctuation",
    "one two three four five six seven eight nine ten\nalpha beta gamma delta\nsolo",
    "word",
    "a  b   c    d",
    "Line with l o s a e t chars to noise. Another! And more?\nmore l1nes here",
    "",
]

PRIMS = [
    ("augment_delete_sentences", "delete_sentences", [(0.3,), (0.9,)]),
    ("augment_delete_words", "delete_words", [(0.2,), (0.5,)]),
    ("augment_merge_lines", "merge_lines", [(0.5,)]),
    ("augment_split_lines", "split_lines", [(0.5,)]),
    ("augment_character_noise", "character_noise", [(0.3,)]),
]


@pytest.mark.parametrize("seed", [0, 1, 42, 12345])
def test_primitive_parity(ref, seed):
    for ref_name, my_name, argsets in PRIMS:
        for args in argsets:
            for text in SAMPLES:
                random.seed(seed)
                want = getattr(ref, ref_name)(text, *args)
                got = getattr(mine, my_name)(text, *args, random.Random(seed))
                assert got == want, (ref_name, args, text)


@pytest.mark.parametrize("seed", [7, 99])
def test_duplicate_lines_parity(ref, seed):
    for text in SAMPLES:
        for maxd in (1, 3):
            random.seed(seed)
            want = ref.augment_duplicate_lines(text, 0.4, maxd)
            got = mine.duplicate_lines(text, 0.4, random.Random(seed), maxd)
            assert got == want


@pytest.mark.parametrize("mode,params", [
    ("words_start", {"num_words": (1, 3)}),
    ("words_end", {"num_words": (1, 3)}),
    ("random_ratio", {"ratio_range": (0.2, 0.5)}),
])
@pytest.mark.parametrize("seed", [3, 21])
def test_duplicate_partial_parity(ref, mode, params, seed):
    for text in SAMPLES:
        random.seed(seed)
        want = ref.augment_duplicate_partial_lines(text, 0.5, mode, params, 2)
        got = mine.duplicate_partial_lines(text, 0.5, mode, params, random.Random(seed), 2)
        assert got == want


@pytest.mark.parametrize("seed", [5, 77])
def test_whitespace_noise_parity(ref, seed):
    for text in SAMPLES:
        random.seed(seed)
        want = ref.augment_whitespace_noise(text, 0.2, 0.3)
        got = mine.whitespace_noise(text, 0.2, 0.3, random.Random(seed))
        assert got == want


_PROFILES = [
    ("setting_slight_stutter", mine.setting_slight_stutter),
    ("setting_gappy_and_fragmented", mine.setting_gappy_and_fragmented),
    ("setting_overly_eager_diff", mine.setting_overly_eager_diff),
    ("setting_line_boundary_chaos", mine.setting_line_boundary_chaos),
    ("setting_classic_bad_ocr", mine.setting_classic_bad_ocr),
    ("setting_the_echo_chamber", mine.setting_the_echo_chamber),
    ("setting_telegraphic_transmission", mine.setting_telegraphic_transmission),
    ("setting_jittery_frame_capture", mine.setting_jittery_frame_capture),
    ("setting_minimalist_diff_max_omission", mine.setting_minimalist_diff_max_omission),
    ("setting_comprehensive_degradation", mine.setting_comprehensive_degradation),
]


@pytest.mark.parametrize("seed", [0, 42, 777])
def test_profile_parity(ref, seed):
    for ref_name, my_fn in _PROFILES:
        for text in SAMPLES:
            random.seed(seed)
            want = getattr(ref, ref_name)(text)
            got = my_fn(text, random.Random(seed))
            assert got == want, (ref_name, seed, text[:30])


def test_augment_stage_deterministic(spark, sf_dir):
    from ocr_dataset_builder_spark import synth

    flat = synth.span_rows(spark, sf_dir).where("kind = 'text'").limit(200)
    out1 = {
        (r["doc_id"], r["span_offset"]): (r["setting_id"], r["augmented"])
        for r in mine.augment_stage(flat).collect()
    }
    out2 = {
        (r["doc_id"], r["span_offset"]): (r["setting_id"], r["augmented"])
        for r in mine.augment_stage(flat).collect()
    }
    assert out1 == out2
    assert len(out1) == 200
    assert len({v[0] for v in out1.values()}) > 3  # profiles actually vary
