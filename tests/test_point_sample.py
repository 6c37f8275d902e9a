"""point_sample parity vs torch F.grid_sample (bilinear,
align_corners=False, border padding) — the PointRend sampling oracle
(SURVEY.md §2.9 grid_sample row)."""

import numpy as np
import torch
import torch.nn.functional as F


def test_point_sample_matches_grid_sample(rng):
    from segmentron_tpu.ops import point_sample

    b, h, w, c, n = 2, 13, 17, 5, 64
    feat = rng.randn(b, h, w, c).astype(np.float32)
    coords = rng.rand(b, n, 2).astype(np.float32)  # (x, y) in [0, 1]

    out = np.asarray(point_sample(feat, coords))

    t_feat = torch.from_numpy(feat.transpose(0, 3, 1, 2))  # NCHW
    # grid_sample grid is in [-1, 1], (x, y), shape (B, 1, N, 2)
    grid = torch.from_numpy(coords * 2.0 - 1.0).unsqueeze(1)
    ref = F.grid_sample(
        t_feat, grid, mode="bilinear", padding_mode="border",
        align_corners=False,
    )  # (B, C, 1, N)
    ref = ref.squeeze(2).permute(0, 2, 1).numpy()  # (B, N, C)

    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_uncertainty_top2():
    from segmentron_tpu.ops import uncertainty_top2

    logits = np.array([[1.0, 3.0, 2.9], [5.0, 0.0, 0.0]], np.float32)
    unc = np.asarray(uncertainty_top2(logits))
    np.testing.assert_allclose(unc, [-0.1, -5.0], atol=1e-6)
