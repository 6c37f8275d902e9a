"""Op-level parity vs torch-CPU oracles (SURVEY.md §4 strategy #1).

torch 2.13+cpu is the semantics oracle for ATen ops the reference uses:
bilinear interpolate (both align_corners modes) and adaptive_avg_pool2d.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from segmentron_tpu.ops import adaptive_avg_pool, resize_bilinear

SIZES = [
    ((3, 17, 23), (33, 47)),   # upsample, odd sizes
    ((3, 33, 47), (17, 23)),   # downsample
    ((3, 16, 16), (64, 64)),   # x4 decoder upsample
    ((3, 129, 129), (513, 513)),  # VOC-style odd crop
    ((3, 7, 9), (7, 9)),       # identity
    ((3, 5, 5), (1, 1)),       # collapse to 1
    ((3, 1, 1), (8, 8)),       # expand from 1
]


@pytest.mark.parametrize("in_shape,out_size", SIZES)
@pytest.mark.parametrize("align_corners", [True, False])
def test_bilinear_matches_torch(rng, in_shape, out_size, align_corners):
    c, h, w = in_shape
    x = rng.randn(2, h, w, c).astype(np.float32)
    got = np.asarray(resize_bilinear(x, out_size, align_corners=align_corners))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(
        xt, size=out_size, mode="bilinear", align_corners=align_corners
    ).permute(0, 2, 3, 1).numpy()
    # atol dominates: residuals are fp32 accumulation-order noise
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("in_size", [(6, 6), (17, 23), (33, 65), (97, 97)])
@pytest.mark.parametrize("out_size", [1, 2, 3, 6])
def test_adaptive_pool_matches_torch(rng, in_size, out_size):
    h, w = in_size
    x = rng.randn(2, h, w, 5).astype(np.float32)
    got = np.asarray(adaptive_avg_pool(x, out_size))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.adaptive_avg_pool2d(xt, out_size).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bilinear_3d_input(rng):
    x = rng.randn(9, 11, 4).astype(np.float32)
    got = np.asarray(resize_bilinear(x, (18, 22)))
    assert got.shape == (18, 22, 4)
