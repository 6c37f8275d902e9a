"""Deterministic input pipeline (SURVEY §7 step 3, VERDICT r1 item 4):
augmentation draws are keyed by (seed, epoch, index), never by thread
scheduling, so two multi-worker passes are byte-identical and epochs
differ from each other.
"""

import numpy as np

from segmentron_tpu.data import DataLoader
from segmentron_tpu.data.dataloader import get_segmentation_dataset


def _make_loader(fresh_cfg, seed=0):
    fresh_cfg.DATASET.NAME = "synthetic"
    fresh_cfg.TRAIN.CROP_SIZE = 32
    fresh_cfg.TRAIN.BASE_SIZE = 40
    ds = get_segmentation_dataset("synthetic", split="train", mode="train")
    return DataLoader(
        ds, batch_size=4, shuffle=True, seed=seed, num_workers=8, prefetch=0
    )


def _collect(loader, epoch):
    loader.set_epoch(epoch)
    out = []
    for batch in loader:
        out.append((np.asarray(batch["image"]), np.asarray(batch["mask"])))
        if len(out) >= 3:
            break
    return out


def test_two_passes_identical_with_8_workers(fresh_cfg, tmp_path):
    a = _collect(_make_loader(fresh_cfg), epoch=0)
    b = _collect(_make_loader(fresh_cfg), epoch=0)
    for k, ((ia, ma), (ib, mb)) in enumerate(zip(a, b)):
        if not np.array_equal(ia, ib):
            # observed to fire rarely under heavy host load (r4); dump
            # both passes so a firing is diagnosable, not just red
            np.save(tmp_path / f"pass_a{k}.npy", ia)
            np.save(tmp_path / f"pass_b{k}.npy", ib)
            per_img = np.abs(ia - ib).reshape(ia.shape[0], -1).max(1)
            raise AssertionError(
                f"batch {k} image mismatch; per-image maxdiff={per_img}; "
                f"arrays dumped under {tmp_path}"
            )
        np.testing.assert_array_equal(ma, mb)


def test_epochs_differ(fresh_cfg):
    loader = _make_loader(fresh_cfg)
    a = _collect(loader, epoch=0)
    b = _collect(loader, epoch=1)
    assert any(
        not np.array_equal(ia, ib) for (ia, _), (ib, _) in zip(a, b)
    ), "epoch 0 and 1 produced identical augmented batches"


def test_per_sample_rng_is_index_keyed(fresh_cfg):
    """The same sample re-fetched out of order gets the same augmentation."""
    fresh_cfg.DATASET.NAME = "synthetic"
    fresh_cfg.TRAIN.CROP_SIZE = 32
    fresh_cfg.TRAIN.BASE_SIZE = 40
    ds = get_segmentation_dataset("synthetic", split="train", mode="train")
    ds.set_epoch(0)
    img1, mask1, _ = ds[3]
    _ = ds[1]  # interleave other fetches
    _ = ds[5]
    img2, mask2, _ = ds[3]
    np.testing.assert_array_equal(img1, img2)
    np.testing.assert_array_equal(mask1, mask2)
