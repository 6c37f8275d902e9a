"""End-to-end tests on a REAL photograph (SURVEY §4 strategy #4;
VERDICT r4 missing #1 notes nothing in-tree had touched a real photo).

This container has no datasets and no network, but matplotlib bundles
one real photograph — ``sample_data/grace_hopper.jpg`` (a public-domain
600x512 portrait). These tests build a miniature Pascal-VOC tree from
crops of it (pseudo-masks = quartile bins of blurred luminance, a
local, learnable function of the pixels) and drive the PRODUCTION
chain end to end on real JPEG entropy and real pixel statistics:

- native libjpeg decode == PIL bit-exact on the real file,
- VOC loader -> train augment -> Trainer: loss decreases and val
  pixel-accuracy beats the untrained model,
- tools/demo.py writes a palette PNG for the photo.

Also pins the cfg.ROOT_PATH contract: relative dataset roots resolve
against it (reference: seg_data_base.py joins cfg.ROOT_PATH onto each
dataset's default root), which is what lets the Trainer see a dataset
tree in a temp dir without new config keys.
"""

import os
import sys

import numpy as np
import pytest
from PIL import Image

from segmentron_tpu.data.sample_photo import build_mini_voc, sample_photo_path

PHOTO = sample_photo_path()
pytestmark = pytest.mark.skipif(
    PHOTO is None, reason="matplotlib sample photo unavailable"
)


@pytest.fixture(scope="module")
def voc_tree(tmp_path_factory):
    """Mini Pascal-VOC layout under <root>/datasets/voc/VOC2012 built
    from real-photo crops: 16 train + 4 val images, 160x160, JPEG q95."""
    root = tmp_path_factory.mktemp("real_photo_root")
    build_mini_voc(str(root), train=16, val=4, size=160, seed=7)
    return root


def _voc_cfg(fresh_cfg, voc_tree, tmp_path):
    fresh_cfg.ROOT_PATH = str(voc_tree)
    fresh_cfg.DATASET.NAME = "pascal_voc"
    fresh_cfg.DATASET.WORKERS = 2
    fresh_cfg.TRAIN.EPOCHS = 20
    fresh_cfg.TRAIN.BATCH_SIZE = 8
    fresh_cfg.TRAIN.CROP_SIZE = 96
    fresh_cfg.TRAIN.BASE_SIZE = 128
    fresh_cfg.TRAIN.SNAPSHOT_EPOCH = 0
    fresh_cfg.TRAIN.MODEL_SAVE_DIR = str(tmp_path / "ckpt")
    fresh_cfg.TRAIN.LOG_SAVE_DIR = str(tmp_path / "logs")
    fresh_cfg.SOLVER.LR = 0.1
    fresh_cfg.MODEL.BN_MOMENTUM = 0.3  # warm the running stats fast
    fresh_cfg.SOLVER.AUX = True
    fresh_cfg.TEST.SCALES = [1.0]
    fresh_cfg.TEST.FLIP = False
    fresh_cfg.MODEL.MODEL_NAME = "FCN"
    fresh_cfg.MODEL.BACKBONE = "resnet18"
    fresh_cfg.MODEL.OUTPUT_STRIDE = 16
    fresh_cfg.TPU.PREFETCH = 0
    return fresh_cfg


def test_root_path_resolves_relative_dataset_roots(fresh_cfg, voc_tree):
    from segmentron_tpu.data.dataloader import get_segmentation_dataset

    fresh_cfg.ROOT_PATH = str(voc_tree)
    ds = get_segmentation_dataset("pascal_voc", split="train", mode="train")
    assert ds.root == os.path.join(str(voc_tree), "datasets/voc/VOC2012")
    assert len(ds) == 16
    # absolute roots bypass ROOT_PATH
    ds2 = get_segmentation_dataset(
        "pascal_voc",
        root=os.path.join(str(voc_tree), "datasets/voc/VOC2012"),
        split="val",
        mode="val",
    )
    assert len(ds2) == 4


def test_native_decode_real_photo_matches_pil():
    from segmentron_tpu.data._native import decode_jpeg

    with open(PHOTO, "rb") as f:
        data = f.read()
    out = decode_jpeg(data)
    if out is None:
        pytest.skip("libjpeg not linked")
    ref = np.asarray(Image.open(PHOTO).convert("RGB"))
    assert out.shape == ref.shape
    np.testing.assert_array_equal(out, ref)  # same libjpeg underneath


def test_trainer_learns_real_photo(fresh_cfg, voc_tree, tmp_path):
    import jax

    from segmentron_tpu.engine import Trainer

    _voc_cfg(fresh_cfg, voc_tree, tmp_path)
    trainer = Trainer()
    assert trainer.train_dataset.NUM_CLASS == 21

    batch = next(iter(trainer.train_loader))
    state0, loss0 = trainer.train_step(
        trainer.state, batch["image"], batch["mask"]
    )
    trainer.state = state0  # TPU.DONATE invalidates the donated input state
    loss0 = float(jax.device_get(loss0))
    pix0, _ = trainer.validate()

    final_loss = trainer.train()
    assert np.isfinite(final_loss)
    assert final_loss < 0.8 * loss0, (loss0, final_loss)

    pix1, miou1 = trainer.validate()
    # the luminance-bin mapping is local and easy: the trained model
    # must clearly beat both its untrained self and 4-class chance
    assert pix1 > pix0 + 0.05, (pix0, pix1)
    assert pix1 > 0.35 and 0.0 <= miou1 <= 1.0, (pix1, miou1)


def test_demo_writes_palette_png_for_real_photo(fresh_cfg, tmp_path):
    import runpy

    small = tmp_path / "hopper_small.jpg"
    Image.open(PHOTO).convert("RGB").resize((128, 152)).save(small, quality=95)

    out_dir = tmp_path / "visual"
    argv = [
        "tools/demo.py",
        "--input-img", str(small),
        "DATASET.NAME", "pascal_voc",
        "MODEL.MODEL_NAME", "FCN",
        "MODEL.BACKBONE", "resnet18",
        "TRAIN.SYNC_BATCH_NORM", "False",
        "VISUAL.OUTPUT_DIR", str(out_dir),
    ]
    old = sys.argv
    sys.argv = argv
    try:
        runpy.run_path(
            os.path.join(os.path.dirname(__file__), "..", "tools", "demo.py"),
            run_name="__main__",
        )
    finally:
        sys.argv = old
    out = out_dir / "hopper_small_mask.png"
    assert out.is_file()
    mask = Image.open(out)
    assert mask.size == (128, 152)


def test_device_normalize_real_pixels_matches_host():
    """In-graph uint8 normalize == host float math on REAL pixel
    statistics (the test_device_input contract, re-pinned on a real
    photograph rather than uniform noise)."""
    import jax

    from segmentron_tpu.ops.preprocess import normalize_u8

    mean = [0.485, 0.456, 0.406]
    std = [0.229, 0.224, 0.225]
    arr = np.asarray(Image.open(PHOTO).convert("RGB"))[:256, :256]
    host = (
        arr.astype(np.float32) / 255.0 - np.asarray(mean, np.float32)
    ) / np.asarray(std, np.float32)
    dev = np.asarray(jax.jit(lambda x: normalize_u8(x, mean, std))(arr))
    assert float(np.abs(dev - host).max()) <= 6e-7  # <= 2 ulp
