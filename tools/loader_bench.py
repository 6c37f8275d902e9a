"""Host input-pipeline throughput benchmark (VERDICT r2 weak #4 /
SURVEY §7 "input pipeline throughput").

Measures loader img/s for the TRAIN path (Cityscapes-shaped 2048x1024
JPEG -> random scale/crop/flip/blur -> normalized crop) and the
TESTVAL path (whole-image decode+normalize), against the chip's
measured consumption rates (38.9 img/s train @768^2, 73 img/s serving).

Generates synthetic JPEGs once into a temp dir (no real datasets exist
in this environment), then times ``DataLoader`` end to end — decode,
augmentation and batch stacking included — for several worker counts.

  python tools/loader_bench.py [n_images] [crop]

Prints one JSON line per configuration.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# LOADER_BENCH_CPU=1: measure the HOST pipeline only — device_put goes
# to the local CPU backend (≈ memcpy) instead of through the axon
# loopback relay, whose ~120 MB/s tunnel bandwidth is an artifact of
# THIS container, not of a deployment TPU host (PCIe DMA runs GB/s).
# The async relay puts also back up across epochs and poison per-epoch
# rates (observed: a fully-cached u8 testval epoch measured 50 img/s
# while the next epoch measured 2.8 — the backlog, not the host).
if os.environ.get("LOADER_BENCH_CPU", "0") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
from PIL import Image

from segmentron_tpu.config import cfg
from segmentron_tpu.data.dataloader.seg_data_base import SegmentationDataset
from segmentron_tpu.data.loader import DataLoader


class JpegDirSegmentation(SegmentationDataset):
    """Cityscapes-shaped on-disk dataset: <root>/img_N.jpg + mask_N.png."""

    NUM_CLASS = 19

    def __init__(self, root, split="train", mode=None, n=None, **kw):
        super().__init__(root, split, mode, **kw)
        names = sorted(f for f in os.listdir(root) if f.endswith(".jpg"))
        self.items = names if n is None else names[:n]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index):
        name = self.items[index]
        from segmentron_tpu.data._native import open_rgb

        # same decode route as the real datasets: native libjpeg, and
        # in train mode the lazy DCT-scaled window decode
        img = open_rgb(
            os.path.join(self.root, name), lazy=self.mode == "train"
        )
        from segmentron_tpu.data.cache import open_mask

        mask = open_mask(
            os.path.join(self.root, name.replace("img", "mask").replace(".jpg", ".png"))
        )
        img_t, mask_t = self.transform_pair(img, mask, index)
        return img_t, mask_t, name


def make_dataset_dir(n: int, size=(2048, 1024)) -> str:
    d = os.path.join(tempfile.gettempdir(), f"segtron_loaderbench_{size[0]}x{size[1]}_{n}")
    if os.path.isdir(d) and len(os.listdir(d)) >= 2 * n:
        return d
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        # blobby structure so JPEG sizes resemble street scenes, not noise
        coarse = rng.rand(size[1] // 64 + 1, size[0] // 64 + 1, 3)
        img = np.kron(coarse, np.ones((64, 64, 1)))[: size[1], : size[0]]
        img = ((img * 0.8 + 0.2 * rng.rand(size[1], size[0], 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(d, f"img_{i:03d}.jpg"), quality=90)
        mask = (coarse[..., 0] * 19).astype(np.uint8)
        mask = np.kron(mask, np.ones((64, 64), np.uint8))[: size[1], : size[0]]
        Image.fromarray(mask).save(os.path.join(d, f"mask_{i:03d}.png"))
    return d


def bench_epochs(dataset, batch_size, workers, epochs=2):
    """Per-epoch img/s — separates the cache-populate epoch (cold) from
    the memmap-served epochs (warm)."""
    loader = DataLoader(
        dataset, batch_size=batch_size, shuffle=dataset.mode == "train",
        num_workers=workers, prefetch=0,
    )
    rates = []
    for ep in range(epochs):
        loader.set_epoch(ep)
        n = 0
        t0 = time.time()
        for batch in loader:
            n += batch["image"].shape[0]
        rates.append(n / (time.time() - t0))
    return rates


def bench(dataset, batch_size, workers, epochs=2):
    loader = DataLoader(
        dataset, batch_size=batch_size, shuffle=dataset.mode == "train",
        num_workers=workers, prefetch=0,
    )
    # warmup (thread pool spinup, file cache)
    for _ in loader:
        break
    n = 0
    t0 = time.time()
    for ep in range(epochs):
        loader.set_epoch(ep)
        for batch in loader:
            n += batch["image"].shape[0]
    dt = time.time() - t0
    return n / dt


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    crop = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    root = make_dataset_dir(n_images)
    cfg.defrost()
    cfg.DATASET.MEAN, cfg.DATASET.STD = [0.485, 0.456, 0.406], [0.229, 0.224, 0.225]

    for workers in (1, 4, 8, 16):
        ds = JpegDirSegmentation(
            root, "train", "train", base_size=1024, crop_size=crop
        )
        ips = bench(ds, batch_size=8, workers=workers)
        print(json.dumps({
            "path": "train", "crop": crop, "workers": workers,
            "img_per_sec": round(ips, 2),
            "vs_chip_demand_38.9": round(ips / 38.9, 2),
        }))

    for workers in (4, 8):
        ds = JpegDirSegmentation(root, "val", "testval", crop_size=crop)
        ips = bench(ds, batch_size=1, workers=workers)
        print(json.dumps({
            "path": "testval", "workers": workers,
            "img_per_sec": round(ips, 2),
            "vs_chip_demand_73": round(ips / 73.0, 2),
        }))

    # decoded-image disk cache (VERDICT r3 #4): epoch 1 populates, later
    # epochs memory-map raw pixels off the page cache instead of
    # decoding. Fresh cache dir per run so "cold" is honest.
    import shutil
    import tempfile as _tf

    cache_dir = _tf.mkdtemp(prefix="segtron_decoded_cache_")
    os.environ["SEGMENTRON_DECODED_CACHE"] = cache_dir
    try:
        for path, mode, bs in (("train", "train", 8), ("testval", "testval", 1)):
            ds = JpegDirSegmentation(
                root, "train" if mode == "train" else "val", mode,
                base_size=1024, crop_size=crop,
            )
            cold, warm = bench_epochs(ds, batch_size=bs, workers=4, epochs=2)
            demand = 38.9 if mode == "train" else 73.0
            print(json.dumps({
                "path": f"{path}+decoded_cache", "workers": 4,
                "cold_img_per_sec": round(cold, 2),
                "warm_img_per_sec": round(warm, 2),
                "warm_vs_chip_demand": round(warm / demand, 2),
            }))

        # device-input pipeline (VERDICT r4 #1): the host keeps only the
        # decode (a memmap read on warm epochs) + RNG draws; augment and
        # normalize run on device. The chip demand for the feed is the
        # measured train step rate (63.9 img/s @768^2 b8, BASELINE.md).
        # Fresh cache dir so the cold epoch is honestly cold.
        shutil.rmtree(cache_dir, ignore_errors=True)
        os.makedirs(cache_dir, exist_ok=True)
        from segmentron_tpu.data.device_input import DeviceInput

        for path, mode, bs, demand in (
            ("train", "train", 8, 63.9),
            ("testval", "testval", 1, 73.0),
        ):
            # wipe per section: train and testval read the SAME source
            # files here, so a shared cache would make the second
            # section's "cold" epoch silently warm
            shutil.rmtree(cache_dir, ignore_errors=True)
            os.makedirs(cache_dir, exist_ok=True)
            ds = JpegDirSegmentation(
                root, "train" if mode == "train" else "val", mode,
                base_size=1024, crop_size=crop,
            )
            if mode == "train":
                ds.device_input = DeviceInput(ds, canvas=(1024, 2048))
            else:
                ds.device_input = DeviceInput(normalize_only=True)
            cold, warm = bench_epochs(ds, batch_size=bs, workers=4, epochs=2)
            print(json.dumps({
                "path": f"{path}+device_input+decoded_cache", "workers": 4,
                "cold_img_per_sec": round(cold, 2),
                "warm_img_per_sec": round(warm, 2),
                "warm_vs_chip_demand": round(warm / demand, 2),
            }))
    finally:
        os.environ.pop("SEGMENTRON_DECODED_CACHE", None)
        shutil.rmtree(cache_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
