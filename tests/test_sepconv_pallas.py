"""Fused separable-conv Pallas kernel parity vs the XLA reference
(interpret mode on CPU; the compiled Mosaic path shares the kernel
body). Covers dilation, pre-relu, rectangular shapes and the
BN-folding math."""

import numpy as np
import pytest


@pytest.mark.parametrize("variant", ["v1", "v2"])
@pytest.mark.parametrize("h,w,c,co,d,pre_relu", [
    (16, 24, 8, 16, 1, False),
    (16, 24, 8, 16, 1, True),
    (16, 24, 8, 16, 2, True),   # exit-flow style dilation
    (32, 16, 16, 8, 1, True),
])
def test_fused_sepconv_matches_ref(h, w, c, co, d, pre_relu, variant):
    from segmentron_tpu.ops.sepconv import (
        fused_sepconv_infer,
        fused_sepconv_infer_v2,
        sepconv_ref,
    )

    kernel = fused_sepconv_infer if variant == "v1" else fused_sepconv_infer_v2

    rng = np.random.RandomState(0)
    x = rng.randn(2, h, w, c).astype(np.float32)
    dwk = rng.randn(3, 3, 1, c).astype(np.float32) * 0.2
    pwk = rng.randn(c, co).astype(np.float32) * 0.2
    ms = rng.rand(c).astype(np.float32) + 0.5
    mb = rng.randn(c).astype(np.float32) * 0.1
    os_ = rng.rand(co).astype(np.float32) + 0.5
    ob = rng.randn(co).astype(np.float32) * 0.1

    ref = np.asarray(
        sepconv_ref(x, dwk, ms, mb, pwk, os_, ob, dilation=d, pre_relu=pre_relu)
    )
    out = np.asarray(
        kernel(
            x, dwk, ms, mb, pwk, os_, ob,
            dilation=d, pre_relu=pre_relu, tile_h=8, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_admissibility():
    from segmentron_tpu.ops.sepconv import sepconv_vmem_ok

    # entry-flow block1 second sepconv at 1024x2048 input: 128ch, fits
    # with a short row tile
    assert sepconv_vmem_ok(512, 1024, 128, 128, 1, tile_h=4)
    # decoder sepconvs: 256ch at 256x512
    assert sepconv_vmem_ok(256, 512, 256, 256, 1, tile_h=4)
    # Xception middle flow: v2 has no lane-alignment constraint
    assert sepconv_vmem_ok(64, 128, 728, 728, 1, tile_h=4)
    # VMEM blowout must be rejected
    assert not sepconv_vmem_ok(512, 1024, 1024, 1024, 1)
