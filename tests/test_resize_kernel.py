"""Pure-numpy resize kernel (operators/multimodal.resize_pixels):
property pins for both interpolation modes against the textbook
definitions the reference delegates to cv2 for
(video/processing.py:163-185), plus hand-computed expected outputs."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_dataset_builder_spark.operators.multimodal import (
    INTER_AREA,
    INTER_LINEAR,
    resize_pixels,
)


def _rand(h, w, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w)).astype(np.uint8)


def test_identity_both_modes():
    img = _rand(13, 17)
    assert np.array_equal(resize_pixels(img, 13, 17, INTER_AREA), img)
    assert np.array_equal(resize_pixels(img, 13, 17, INTER_LINEAR), img)


def test_area_integer_factor_is_block_mean():
    img = _rand(12, 16, seed=3)
    out = resize_pixels(img, 6, 8, INTER_AREA)
    for oy in range(6):
        for ox in range(8):
            block = img[2 * oy : 2 * oy + 2, 2 * ox : 2 * ox + 2].astype(int)
            expected = int(np.floor(block.sum() / 4.0 + 0.5))
            assert out[oy, ox] == expected, (oy, ox)


def test_area_factor3_block_mean():
    img = _rand(9, 9, seed=5)
    out = resize_pixels(img, 3, 3, INTER_AREA)
    for oy in range(3):
        for ox in range(3):
            block = img[3 * oy : 3 * oy + 3, 3 * ox : 3 * ox + 3].astype(int)
            expected = int(np.floor(block.sum() / 9.0 + 0.5))
            assert out[oy, ox] == expected


def test_area_fractional_coverage_hand_computed():
    # 1-D check via a 1xN image: 3 pixels -> 2, scale 1.5:
    # out[0] covers [0, 1.5): full px0 + half px1; out[1] covers [1.5, 3)
    img = np.array([[10, 20, 90]], dtype=np.uint8)
    out = resize_pixels(img, 1, 2, INTER_AREA)
    assert out[0, 0] == int(np.floor((10 + 0.5 * 20) / 1.5 + 0.5))  # 13
    assert out[0, 1] == int(np.floor((0.5 * 20 + 90) / 1.5 + 0.5))  # 67


def test_area_constant_image_preserved_any_scale():
    img = np.full((7, 11), 137, dtype=np.uint8)
    for oh, ow in [(3, 5), (7, 11), (2, 9), (5, 4)]:
        assert np.all(resize_pixels(img, oh, ow, INTER_AREA) == 137)


def test_linear_constant_image_preserved():
    img = np.full((6, 6), 42, dtype=np.uint8)
    for oh, ow in [(12, 12), (9, 4), (6, 6), (3, 3)]:
        assert np.all(resize_pixels(img, oh, ow, INTER_LINEAR) == 42)


def test_linear_2x_upscale_hand_computed():
    # 1x2 -> 1x4 with half-pixel centers (s = 0.5):
    # src positions: -0.25 (clamp->0), 0.25, 0.75, 1.25 (clamp->1)
    img = np.array([[0, 100]], dtype=np.uint8)
    out = resize_pixels(img, 1, 4, INTER_LINEAR)
    assert list(out[0]) == [0, 25, 75, 100]


def test_linear_preserves_ramp_at_same_scale():
    img = np.tile(np.arange(0, 160, 10, dtype=np.uint8), (4, 1))
    out = resize_pixels(img, 4, 16, INTER_LINEAR)
    assert np.array_equal(out, img)


def test_linear_weights_rows_sum_to_one():
    from ocr_dataset_builder_spark.operators.multimodal import (
        _area_weights,
        _linear_weights,
    )

    for n_in, n_out in [(5, 9), (9, 5), (7, 7), (3, 10), (16, 3)]:
        lw = _linear_weights(n_in, n_out)
        assert np.allclose(lw.sum(axis=1), 1.0)
        aw = _area_weights(n_in, n_out)
        assert np.allclose(aw.sum(axis=1), n_in / n_out)


def test_range_and_dtype():
    img = _rand(10, 10, seed=9)
    for mode in (INTER_AREA, INTER_LINEAR):
        out = resize_pixels(img, 4, 7, mode)
        assert out.dtype == np.uint8
        assert out.min() >= 0 and out.max() <= 255


def test_unknown_mode_raises():
    with pytest.raises(ValueError, match="interpolation"):
        resize_pixels(_rand(4, 4), 2, 2, "INTER_CUBIC")
