"""Native host-preprocessing kernel tests: the C++ fused
resize+normalize must match the PIL/numpy reference path within PIL's
fixed-point coefficient error, and nearest mask resize must be exact
vs the numpy formula."""

import numpy as np
import pytest

from segmentron_tpu.data._native import (
    fused_resize_normalize,
    native_lib,
    resize_nearest_i32,
)

requires_native = pytest.mark.skipif(
    native_lib() is None, reason="native toolchain unavailable"
)


@requires_native
@pytest.mark.parametrize("src_hw,dst_hw", [
    ((64, 96), (128, 192)),   # upscale -> pure bilinear
    ((128, 192), (50, 75)),   # downscale -> widened triangle support
    ((97, 61), (97, 61)),     # identity
])
def test_fused_resize_normalize_matches_pil(src_hw, dst_hw):
    from PIL import Image

    rng = np.random.RandomState(0)
    src = rng.randint(0, 256, (*src_hw, 3), np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    out = fused_resize_normalize(src, dst_hw, mean, std)
    ref_img = Image.fromarray(src).resize((dst_hw[1], dst_hw[0]), Image.BILINEAR)
    ref = (np.asarray(ref_img, np.float32) / 255.0 - mean) / std

    # PIL quantizes both coefficients and the intermediate pass to 8
    # bits; allow a few u8 steps of error post-normalization.
    tol = 4.0 / 255.0 / std.min()
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < tol


@requires_native
def test_resize_nearest_i32_exact():
    rng = np.random.RandomState(1)
    src = rng.randint(-1, 19, (101, 67), np.int32)
    out = resize_nearest_i32(src, (53, 200))
    ys = np.minimum(((np.arange(53) + 0.5) * 101 / 53).astype(int), 100)
    xs = np.minimum(((np.arange(200) + 0.5) * 67 / 200).astype(int), 66)
    np.testing.assert_array_equal(out, src[ys][:, xs])


def test_fallback_path_works(monkeypatch):
    import segmentron_tpu.data._native as nat

    monkeypatch.setattr(nat, "_LIB", None)
    monkeypatch.setattr(nat, "_TRIED", True)
    src = np.zeros((32, 32, 3), np.uint8)
    mean = np.array([0.5, 0.5, 0.5], np.float32)
    std = np.array([0.5, 0.5, 0.5], np.float32)
    out = nat.fused_resize_normalize(src, (16, 16), mean, std)
    assert out.shape == (16, 16, 3)
    np.testing.assert_allclose(out, -1.0)
    m = nat.resize_nearest_i32(np.ones((8, 8), np.int32), (4, 4))
    np.testing.assert_array_equal(m, 1)


def test_remap_labels_matches_numpy():
    from segmentron_tpu.data._native import remap_labels

    rng = np.random.RandomState(2)
    src = rng.randint(0, 256, (37, 53), np.uint8)
    lut = rng.randint(-1, 19, (256,)).astype(np.int32)
    out = remap_labels(src, lut)
    np.testing.assert_array_equal(out, lut[src])
