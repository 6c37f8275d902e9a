"""Mask colorization + demo CLI (reference: ``segmentron/utils/
visualize.py::get_color_pallete`` / ``show_colorful_images`` and
``tools/demo.py``).

The palette values asserted here are the canonical published ones (VOC
bit-reversal construction, official Cityscapes trainId colors, ADE20K
release palette) — not copied expectations, independent oracles.
"""

import os
import sys

import numpy as np
import pytest


def test_voc_palette_bit_construction():
    from segmentron_tpu.utils.visualize import vocpallete

    # Canonical PASCAL VOC colors from the bit-reversal construction.
    assert vocpallete[0:3] == [0, 0, 0]  # background
    assert vocpallete[3:6] == [128, 0, 0]  # aeroplane
    assert vocpallete[6:9] == [0, 128, 0]  # bicycle
    assert vocpallete[9:12] == [128, 128, 0]  # bird
    assert vocpallete[15 * 3 : 15 * 3 + 3] == [192, 128, 128]  # person
    assert len(vocpallete) == 256 * 3


def test_color_pallete_cityscapes():
    from segmentron_tpu.utils.visualize import get_color_pallete

    mask = np.array([[0, 10], [-1, 18]], np.int64)
    rgb = np.asarray(get_color_pallete(mask, "cityscapes").convert("RGB"))
    assert tuple(rgb[0, 0]) == (128, 64, 128)  # road
    assert tuple(rgb[0, 1]) == (0, 130, 180)  # sky
    assert tuple(rgb[1, 0]) == (0, 0, 0)  # ignore renders black
    assert tuple(rgb[1, 1]) == (119, 11, 32)  # bicycle


def test_color_pallete_ade_label_shift():
    from segmentron_tpu.utils.visualize import get_color_pallete

    # ADE stores classes 0..149; the palette indexes them at +1 so that
    # ignore (-1) lands on palette slot 0 = black.
    mask = np.array([[0, -1]], np.int64)
    rgb = np.asarray(get_color_pallete(mask, "ade20k").convert("RGB"))
    assert tuple(rgb[0, 0]) == (120, 120, 120)  # class 0 = wall
    assert tuple(rgb[0, 1]) == (0, 0, 0)  # ignore


def test_color_pallete_voc_ignore_is_background():
    from segmentron_tpu.utils.visualize import get_color_pallete

    mask = np.array([[-1, 1]], np.int64)
    rgb = np.asarray(get_color_pallete(mask, "pascal_voc").convert("RGB"))
    assert tuple(rgb[0, 0]) == (0, 0, 0)
    assert tuple(rgb[0, 1]) == (128, 0, 0)


def test_show_colorful_images_saves(tmp_path):
    from segmentron_tpu.utils.visualize import show_colorful_images

    out = tmp_path / "pred.png"
    img = show_colorful_images(
        np.zeros((1, 4, 4), np.int64), "cityscapes", path=str(out)
    )
    assert out.exists()
    assert img.size == (4, 4)


def test_demo_cli_end_to_end(tmp_path, monkeypatch, fresh_cfg):
    """tools/demo.py: config + image in, colorized mask PNG out."""
    from PIL import Image

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # monkeypatch reverts the path entry after the test; drop the
    # generically-named module from the import cache too so nothing
    # leaks into later tests (ADVICE r3)
    monkeypatch.syspath_prepend(os.path.join(repo, "tools"))
    monkeypatch.delitem(sys.modules, "demo", raising=False)
    import demo

    img_path = tmp_path / "street.png"
    Image.fromarray(
        (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)
    ).save(img_path)
    out_dir = tmp_path / "visual"

    monkeypatch.setattr(
        sys,
        "argv",
        [
            "demo.py",
            "--config-file",
            os.path.join(repo, "configs", "synthetic_fcn_smoke.yaml"),
            "--input-img",
            str(img_path),
            "ROOT_PATH",
            str(tmp_path),
            "VISUAL.OUTPUT_DIR",
            str(out_dir),
            "TRAIN.SYNC_BATCH_NORM",
            "False",
        ],
    )
    try:
        demo.main()
    finally:
        sys.modules.pop("demo", None)

    out = out_dir / "street_mask.png"
    assert out.exists()
    mask = Image.open(out)
    assert mask.size == (64, 64)
    assert mask.mode == "P"
