"""Regenerate tests/fixtures/coco_mini — a 3-image COCO instances
fixture exercising all three segmentation formats (uncompressed RLE,
compressed RLE, polygon), the 21-class remap, and the <1000-foreground-
pixel filter (image 3 is built to be filtered out).

Run from the repo root: python tests/fixtures/make_coco_mini.py
"""

import json
import os
import sys

import numpy as np
from PIL import Image

repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, repo)

from segmentron_tpu.data.dataloader._coco_min import rle_encode  # noqa: E402

OUT = os.path.join(repo, "tests", "fixtures", "coco_mini")


def block_mask(h, w, r0, r1, c0, c1):
    m = np.zeros((h, w), np.uint8)
    m[r0:r1, c0:c1] = 1
    return m


def uncompressed_counts(mask):
    flat = mask.T.reshape(-1)
    change = np.flatnonzero(np.diff(flat)) + 1
    bounds = np.concatenate(([0], change, [flat.size]))
    counts = np.diff(bounds).tolist()
    if flat[0] == 1:
        counts = [0] + counts
    return [int(c) for c in counts]


def main():
    os.makedirs(os.path.join(OUT, "annotations"), exist_ok=True)
    os.makedirs(os.path.join(OUT, "val2017"), exist_ok=True)
    rs = np.random.RandomState(0)

    images = [
        {"id": 1, "file_name": "000000000001.jpg", "height": 64, "width": 96},
        {"id": 2, "file_name": "000000000002.jpg", "height": 48, "width": 64},
        {"id": 3, "file_name": "000000000003.jpg", "height": 32, "width": 32},
    ]
    for im in images:
        arr = rs.randint(0, 255, (im["height"], im["width"], 3), np.uint8)
        Image.fromarray(arr).save(
            os.path.join(OUT, "val2017", im["file_name"]), quality=90
        )

    m1a = block_mask(64, 96, 5, 45, 5, 45)      # 1600 px, cat 5 -> class 1
    m1b = block_mask(64, 96, 50, 60, 50, 90)    # 400 px, cat 2 -> class 2
    m3 = block_mask(32, 32, 0, 10, 0, 10)       # 100 px -> image filtered
    annotations = [
        # image 1: uncompressed RLE + compressed RLE + ignored category
        {"id": 10, "image_id": 1, "category_id": 5,
         "segmentation": {"size": [64, 96],
                          "counts": uncompressed_counts(m1a)}},
        {"id": 11, "image_id": 1, "category_id": 2,
         "segmentation": {"size": [64, 96], "counts": rle_encode(m1b)}},
        {"id": 12, "image_id": 1, "category_id": 99,
         "segmentation": {"size": [64, 96],
                          "counts": uncompressed_counts(m1b)}},
        # image 2: polygon (rect 10..58 x, 5..40 y -> ~1700 px), cat 16
        {"id": 20, "image_id": 2, "category_id": 16,
         "segmentation": [[10.0, 5.0, 58.0, 5.0, 58.0, 40.0, 10.0, 40.0]]},
        # image 3: too small -> filtered by _preprocess
        {"id": 30, "image_id": 3, "category_id": 5,
         "segmentation": {"size": [32, 32], "counts": uncompressed_counts(m3)}},
    ]
    data = {"images": images, "annotations": annotations, "categories": []}
    with open(os.path.join(OUT, "annotations", "instances_val2017.json"), "w") as f:
        json.dump(data, f)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
