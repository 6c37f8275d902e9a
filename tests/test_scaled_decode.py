"""DCT-scaled windowed JPEG decode for the train path (LazyJpeg +
native/segtron_host.cpp::decode_jpeg_rgb_scaled + the row-windowed
train_augment_u8).

Contracts pinned here:
- num=8 (full-scale) windowed decode is bit-exact vs the eager decode
  for every row in the window, so the row-window plumbing introduces
  zero numerical drift when no DCT scaling applies (upscale targets).
- the full augmentation through a LazyJpeg keeps the SAME geometry /
  rng stream as the eager path (masks bit-exact) and, at num=8, the
  SAME pixels; at num<8 the image differs only by the antialias the
  scaled IDCT applies (bounded on a smooth image).
- pick_scale never selects a decode smaller than the resample target.
"""

import io

import numpy as np
import pytest
from PIL import Image

from segmentron_tpu.data._native import (
    LazyJpeg,
    decode_jpeg,
    native_lib,
    open_rgb,
    resample_row_window,
    train_augment,
)
from segmentron_tpu.data.dataloader.synthetic import SyntheticSegmentation

pytestmark = pytest.mark.skipif(
    native_lib() is None, reason="native lib unavailable"
)


def _jpeg_bytes(h=120, w=160, smooth=False, quality=95):
    if smooth:
        yy, xx = np.mgrid[0:h, 0:w]
        arr = np.stack(
            [
                127 + 120 * np.sin(yy / 37.0),
                127 + 120 * np.cos(xx / 53.0),
                127 + 120 * np.sin((xx + yy) / 71.0),
            ],
            -1,
        ).astype(np.uint8)
    else:
        arr = (np.random.RandomState(0).rand(h, w, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def _lazy(data):
    img = Image.open(io.BytesIO(data))
    return LazyJpeg(data, img.size[1], img.size[0])


def test_fullscale_window_bit_exact():
    data = _jpeg_bytes()
    full = decode_jpeg(data)
    if full is None:
        pytest.skip("libjpeg not linked")
    lz = _lazy(data)
    assert lz.scaled_dims(8) == full.shape[:2]
    for lo, hi in [(0, full.shape[0]), (13, 97), (40, 41)]:
        win = lz.decode_window(8, lo, hi)
        assert win is not None
        np.testing.assert_array_equal(win, full[lo:hi])


def test_scaled_dims_and_decode_match_pil_draft_mode():
    data = _jpeg_bytes()
    lz = _lazy(data)
    if decode_jpeg(data) is None:
        pytest.skip("libjpeg not linked")
    for num in (1, 2, 3, 4, 5, 6, 7, 8):
        sh, sw = lz.scaled_dims(num)
        win = lz.decode_window(num, 0, sh)
        assert win is not None and win.shape == (sh, sw, 3)
        # PIL's draft mode only exposes 1/2/4/8 denominators; check those
        if num in (1, 2, 4, 8):
            im = Image.open(io.BytesIO(data))
            im.draft("RGB", (sw, sh))
            ref = np.asarray(im.convert("RGB"))
            assert ref.shape == win.shape
            # same libjpeg scaled IDCT underneath -> bit-exact
            np.testing.assert_array_equal(win, ref)


def test_pick_scale_covers_target():
    lz = LazyJpeg(b"", 1024, 2048)
    allowed = (1, 2, 3, 4, 8)  # 5/8..7/8 measured slower than full
    for oh in (64, 100, 512, 513, 1024, 1500, 4096):
        num = lz.pick_scale(oh, oh * 2)
        assert num in allowed
        sh, sw = lz.scaled_dims(num)
        if oh <= 1024:
            assert sh >= oh and sw >= 2 * oh
            # minimality within the allowed set
            smaller = [n for n in allowed if n < num]
            if smaller:
                ph, pw = lz.scaled_dims(smaller[-1])
                assert ph < oh or pw < 2 * oh
        else:
            assert num == 8  # upscale: full-res decode


def test_resample_row_window_covers_taps():
    # brute-force the native window formula: every tap row used by
    # output rows [y_lo, y_hi) must fall inside the returned window
    import math

    for sh, oh in [(120, 64), (60, 200), (97, 97), (33, 128)]:
        scale = sh / oh
        support = max(scale, 1.0)
        for y_lo, y_hi in [(0, oh), (5, 17), (oh - 1, oh)]:
            lo, hi = resample_row_window(sh, oh, y_lo, y_hi)
            for y in range(y_lo, y_hi):
                center = (y + 0.5) * scale
                t_lo = max(0, math.floor(center - support))
                t_hi = min(sh, math.ceil(center + support))
                assert lo <= t_lo and t_hi <= hi


def test_lazy_train_augment_matches_eager_at_full_scale():
    # upscale target (oh >= h) -> pick_scale returns 8 -> identical
    # pixels; geometry/rng identical by construction
    data = _jpeg_bytes(h=60, w=80)
    full = decode_jpeg(data)
    if full is None:
        pytest.skip("libjpeg not linked")
    ds = SyntheticSegmentation(
        split="train", mode="train", base_size=96, crop_size=64
    )
    lz = _lazy(data)
    mask = Image.fromarray(
        np.random.RandomState(1).randint(0, 19, (60, 80)).astype(np.uint8)
    )
    for idx in range(4):
        out_lazy = ds._sync_transform_native(lz, mask, ds.per_sample_rng(idx))
        out_eager = ds._sync_transform_native(
            Image.fromarray(full), mask, ds.per_sample_rng(idx)
        )
        np.testing.assert_array_equal(out_lazy[1], out_eager[1])
        np.testing.assert_array_equal(out_lazy[0], out_eager[0])


def test_lazy_train_augment_close_at_downscale():
    # big smooth image, small base_size -> deep downscale picks num<8;
    # DCT low-pass vs full-decode-then-triangle must agree closely on
    # smooth content (they differ only in high frequencies)
    data = _jpeg_bytes(h=480, w=640, smooth=True)
    full = decode_jpeg(data)
    if full is None:
        pytest.skip("libjpeg not linked")
    ds = SyntheticSegmentation(
        split="train", mode="train", base_size=96, crop_size=64
    )
    lz = _lazy(data)
    mask = Image.fromarray(
        np.random.RandomState(1).randint(0, 19, (480, 640)).astype(np.uint8)
    )
    saw_scaled = False
    for idx in range(6):
        rng = ds.per_sample_rng(idx)
        # replicate the geometry draws to learn the chosen scale
        probe = ds.per_sample_rng(idx)
        probe.random()
        short = probe.randint(int(96 * 0.5), int(96 * 2.0))
        oh = short  # h < w for this image
        ow = int(1.0 * 640 * oh / 480)
        saw_scaled |= lz.pick_scale(oh, ow) < 8
        out_lazy = ds._sync_transform_native(lz, mask, rng)
        out_eager = ds._sync_transform_native(
            Image.fromarray(full), mask, ds.per_sample_rng(idx)
        )
        np.testing.assert_array_equal(out_lazy[1], out_eager[1])
        err = np.abs(out_lazy[0] - out_eager[0])
        assert float(np.mean(err)) < 0.03, float(np.mean(err))
    assert saw_scaled  # the deep-downscale regime was actually exercised


def test_open_rgb_lazy_roundtrip(tmp_path, monkeypatch):
    data = _jpeg_bytes()
    if decode_jpeg(data) is None:
        pytest.skip("libjpeg not linked")
    p = tmp_path / "x.jpg"
    p.write_bytes(data)
    lz = open_rgb(str(p), lazy=True)
    assert isinstance(lz, LazyJpeg)
    eager = open_rgb(str(p))
    assert lz.size == eager.size
    np.testing.assert_array_equal(np.asarray(lz.to_pil()), np.asarray(eager))
    # env gate restores eager decode
    monkeypatch.setenv("SEGMENTRON_SCALED_DECODE", "0")
    assert not isinstance(open_rgb(str(p), lazy=True), LazyJpeg)
