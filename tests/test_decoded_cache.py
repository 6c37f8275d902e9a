"""Decoded-image disk cache (data/cache.py; VERDICT r3 #4).

Contract: with ``SEGMENTRON_DECODED_CACHE`` set, epoch 1 decodes once
and populates the cache, later epochs memory-map raw pixels — and the
loader output is BIT-IDENTICAL to the eager full-decode path (the cache
bypasses the DCT-scaled lazy JPEG decode precisely so its entries hold
exact pixels).
"""

import os

import numpy as np
import pytest
from PIL import Image

from segmentron_tpu.config import cfg
from segmentron_tpu.data._native import open_rgb
from segmentron_tpu.data.cache import CachedImage, DecodedCache, open_mask
from segmentron_tpu.data.dataloader.seg_data_base import SegmentationDataset


@pytest.fixture()
def imgdir(tmp_path):
    rs = np.random.RandomState(0)
    coarse = rs.rand(8, 12, 3)
    arr = (np.kron(coarse, np.ones((16, 16, 1))) * 255).astype(np.uint8)
    Image.fromarray(arr).save(tmp_path / "a.png")
    Image.fromarray(arr).save(tmp_path / "a.jpg", quality=92)
    mask = (np.kron(coarse[..., 0], np.ones((16, 16))) * 18).astype(np.uint8)
    Image.fromarray(mask).save(tmp_path / "a_mask.png")
    return tmp_path


@pytest.fixture()
def cache_env(tmp_path, monkeypatch):
    d = str(tmp_path / "decoded_cache")
    monkeypatch.setenv("SEGMENTRON_DECODED_CACHE", d)
    yield d
    monkeypatch.delenv("SEGMENTRON_DECODED_CACHE", raising=False)


class _DirDataset(SegmentationDataset):
    NUM_CLASS = 19

    def __init__(self, root, img_name, mode, **kw):
        super().__init__(str(root), "train", mode, **kw)
        self.img_path = os.path.join(str(root), img_name)
        self.mask_path = os.path.join(str(root), "a_mask.png")

    def __len__(self):
        return 1

    def __getitem__(self, index):
        img = open_rgb(self.img_path, lazy=self.mode == "train")
        mask = open_mask(self.mask_path)
        return self.transform_pair(img, mask, index)


def test_open_rgb_populates_and_hits(imgdir, cache_env):
    eager = np.asarray(Image.open(imgdir / "a.png").convert("RGB"))
    got = open_rgb(str(imgdir / "a.png"))
    assert isinstance(got, CachedImage)
    np.testing.assert_array_equal(np.asarray(got), eager)
    # entry exists now; second open is a hit that memory-maps it
    cache = DecodedCache(cache_env)
    assert cache.get(str(imgdir / "a.png")) is not None
    again = open_rgb(str(imgdir / "a.png"))
    assert isinstance(again.arr, np.memmap)
    np.testing.assert_array_equal(np.asarray(again), eager)


def test_stale_entry_never_matches(imgdir, cache_env):
    """A re-written source (different size/mtime) misses its old entry:
    open_rgb goes back to the decoder — proven here by the re-read of a
    now-corrupt file raising instead of serving stale cached pixels."""
    p = str(imgdir / "a.png")
    open_rgb(p)  # populate
    with open(p, "wb") as f:
        f.write(b"not a png")
    with pytest.raises(Exception):
        open_rgb(p)


@pytest.mark.parametrize("img_name", ["a.png", "a.jpg"])
@pytest.mark.parametrize("mode", ["train", "testval"])
def test_pipeline_parity_with_cache(imgdir, monkeypatch, fresh_cfg, mode, img_name):
    fresh_cfg.TRAIN.CROP_SIZE = 64
    fresh_cfg.TRAIN.BASE_SIZE = 96

    # reference: cache off, eager full decode (no DCT-scaled lazy path)
    monkeypatch.delenv("SEGMENTRON_DECODED_CACHE", raising=False)
    monkeypatch.setenv("SEGMENTRON_SCALED_DECODE", "0")
    ds = _DirDataset(imgdir, img_name, mode)
    ref_img, ref_mask = ds[0]

    monkeypatch.setenv("SEGMENTRON_DECODED_CACHE", str(imgdir / "dc"))
    cold_img, cold_mask = _DirDataset(imgdir, img_name, mode)[0]  # populates
    warm_img, warm_mask = _DirDataset(imgdir, img_name, mode)[0]  # memmaps

    np.testing.assert_array_equal(ref_img, cold_img)
    np.testing.assert_array_equal(ref_img, warm_img)
    np.testing.assert_array_equal(ref_mask, cold_mask)
    np.testing.assert_array_equal(ref_mask, warm_mask)


def test_open_mask_caches_u8(imgdir, cache_env):
    p = str(imgdir / "a_mask.png")
    ref = np.asarray(Image.open(p))
    got = np.asarray(open_mask(p))
    np.testing.assert_array_equal(ref, got)
    assert DecodedCache(cache_env).get(p) is not None
    np.testing.assert_array_equal(ref, np.asarray(open_mask(p)))


def test_disabled_by_default(imgdir, monkeypatch):
    monkeypatch.delenv("SEGMENTRON_DECODED_CACHE", raising=False)
    assert cfg.DATASET.DECODED_CACHE == ""
    got = open_rgb(str(imgdir / "a.png"))
    assert not isinstance(got, CachedImage)
