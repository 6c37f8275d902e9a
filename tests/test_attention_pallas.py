"""Flash-attention Pallas kernel parity vs the XLA einsum path
(SURVEY.md §7.8: every kernel gets an XLA-reference fallback + parity
test). Runs the kernel in Pallas interpret mode so the CPU test mesh
covers it; the compiled Mosaic path shares the exact same kernel body.
"""

import numpy as np
import pytest


@pytest.mark.parametrize("p,dk,dv,scale", [
    (600, 32, 64, 1.0),        # unaligned seq -> exercises key masking
    (1024, 64, 64, 0.125),     # aligned, scaled (OCNet-style)
])
def test_flash_attention_matches_xla(p, dk, dv, scale):
    from segmentron_tpu.ops.attention import _attention_pallas, _attention_xla

    rng = np.random.RandomState(0)
    q = rng.randn(2, p, dk).astype(np.float32)
    k = rng.randn(2, p, dk).astype(np.float32)
    v = rng.randn(2, p, dv).astype(np.float32)

    ref = np.asarray(_attention_xla(q, k, v, scale))
    out = np.asarray(
        _attention_pallas(q, k, v, scale=scale, block_q=256, block_k=256,
                          interpret=True)
    )
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
