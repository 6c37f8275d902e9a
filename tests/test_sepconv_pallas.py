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


# ---------------------------------------------------------------- v3
# The v3 kernels fetch halo rows as overlapping BlockSpec streams and
# (optionally) requantize in-register for an s8 x s8 MXU pointwise.
# Oracles use Precision.HIGHEST: the default f32 conv/matmul precision
# on this backend is reduced (~1e-2), which would mask real bugs.

def _v3_case(seed, h, w, c, cin, co):
    import jax
    import jax.numpy as jnp

    ks = jax.random.split(jax.random.PRNGKey(seed), 12)
    return dict(
        y=jax.random.normal(ks[0], (2, h, w, c), jnp.float32),
        xin_conv=jax.random.normal(ks[1], (2, h, w, cin), jnp.float32),
        xin_sum=jax.random.normal(ks[11], (2, h, w, co), jnp.float32),
        dwk=jax.random.normal(ks[2], (3, 3, 1, c)) * 0.3,
        pwk=jax.random.normal(ks[3], (1, 1, c, co)) * 0.2,
        a1=jnp.abs(jax.random.normal(ks[4], (c,))) + 0.3,
        b1=jax.random.normal(ks[5], (c,)) * 0.1,
        a2=jnp.abs(jax.random.normal(ks[6], (co,))) + 0.3,
        b2=jax.random.normal(ks[7], (co,)) * 0.1,
        skw=jax.random.normal(ks[8], (1, 1, cin, co)) * 0.2,
        sa=jnp.abs(jax.random.normal(ks[9], (co,))) + 0.3,
        sb=jax.random.normal(ks[10], (co,)) * 0.1,
    )


def test_v3_matches_ref_fp32_exact():
    import jax
    import jax.numpy as jnp

    from segmentron_tpu.ops.sepconv import fused_sepconv_infer_v3

    P = jax.lax.Precision.HIGHEST
    for d in (1, 2):
        t = _v3_case(d, 32, 64, 12, 8, 16)
        y, dwk, pwk = t["y"], t["dwk"], t["pwk"]
        main = jax.lax.conv_general_dilated(
            jnp.maximum(y, 0), dwk, (1, 1), [(d, d), (d, d)],
            rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=12, precision=P,
        ) * t["a1"] + t["b1"]
        want = jnp.einsum(
            "nhwc,co->nhwo", main, pwk.reshape(12, 16), precision=P
        ) * t["a2"] + t["b2"]
        got = fused_sepconv_infer_v3(
            y, dwk, t["a1"], t["b1"], pwk, t["a2"], t["b2"],
            dilation=d, pre_relu=True, tile_h=8, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("stride,skip,d,pre_relu", [
    (2, "conv", 1, True),    # entry-block end (block1/2/3 @OS16)
    (1, "conv", 1, True),    # entry block3 end @OS8 / exit1
    (1, "conv", 2, False),   # dilated conv-skip
    (1, "sum", 2, True),     # middle-flow end @OS8
    (2, "conv", 2, True),    # strided + dilated
])
def test_v3_skip_matches_ref_fp32_exact(stride, skip, d, pre_relu):
    import jax
    import jax.numpy as jnp

    from segmentron_tpu.ops.sepconv import fused_sepconv_infer_v3_skip

    P = jax.lax.Precision.HIGHEST
    c, cin, co = (16, 16, 16) if skip == "sum" else (12, 8, 16)
    t = _v3_case(stride * 10 + d, 32, 64, c, cin, co)
    y = t["y"]
    xin = t["xin_sum"] if skip == "sum" else t["xin_conv"]
    yy = jnp.maximum(y, 0) if pre_relu else y
    main = jax.lax.conv_general_dilated(
        yy, t["dwk"], (stride, stride), [(d, d), (d, d)],
        rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, precision=P,
    ) * t["a1"] + t["b1"]
    main = jnp.einsum(
        "nhwc,co->nhwo", main, t["pwk"].reshape(c, co), precision=P
    ) * t["a2"] + t["b2"]
    if skip == "conv":
        sk = jax.lax.conv_general_dilated(
            xin, t["skw"], (stride, stride), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=P,
        )
        want = main + sk * t["sa"] + t["sb"]
        got = fused_sepconv_infer_v3_skip(
            y, xin, t["dwk"], t["a1"], t["b1"], t["pwk"], t["a2"], t["b2"],
            t["skw"], t["sa"], t["sb"], dilation=d, stride=stride,
            pre_relu=pre_relu, tile_out=4, skip="conv", interpret=True,
        )
    else:
        want = main + xin
        got = fused_sepconv_infer_v3_skip(
            y, xin, t["dwk"], t["a1"], t["b1"], t["pwk"], t["a2"], t["b2"],
            dilation=d, stride=1, pre_relu=pre_relu, tile_out=4,
            skip="sum", interpret=True,
        )
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_v3_int8_dot_matches_xla_pw_semantics():
    """int8_dot path vs the shipped XLA "pw"-mode quantized pipeline:
    same static ranges, so they agree to int8 rounding tolerance."""
    import jax
    import jax.numpy as jnp

    from segmentron_tpu.ops.quant import bn_amax, qconv, quantize_static
    from segmentron_tpu.ops.sepconv import (
        fold_sepconv_int8,
        fused_sepconv_infer_v3,
    )

    t = _v3_case(7, 32, 64, 8, 8, 16)
    y, dwk, pwk = t["y"], t["dwk"], t["pwk"]
    d = 1
    z = jnp.maximum(y, 0)
    z = jax.lax.conv_general_dilated(
        z, dwk, (1, 1), [(d, d), (d, d)], rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=8,
        preferred_element_type=jnp.float32,
    ) * t["a1"] + t["b1"]
    q = quantize_static(z, bn_amax(t["a1"], t["b1"]))
    want = qconv(q, pwk, 1, 0, 1, bn_affine=(t["a2"], t["b2"]))

    ms, mb, wq, osc = fold_sepconv_int8(t["a1"], t["b1"], pwk, t["a2"])
    got = fused_sepconv_infer_v3(
        y, dwk, ms, mb, wq, osc, t["b2"], dilation=d, pre_relu=True,
        tile_h=8, int8_dot=True, interpret=True,
    )
    rel = float(jnp.abs(got - want).max() / jnp.abs(want).max())
    assert rel < 0.05, rel


def test_xception_block_fused_chain_parity():
    """Whole XceptionBlock through the fused pallas chain vs the XLA
    pw-mode path (sum skip, the only gated-in case)."""
    import jax
    import jax.numpy as jnp

    from segmentron_tpu.config import cfg
    from segmentron_tpu.models.backbones.xception import XceptionBlock

    import os

    os.environ["SEGMENTRON_PALLAS_INTERPRET"] = "1"
    cfg.defrost()
    prev = (
        cfg.TPU.INT8_ACTIVATIONS,
        cfg.TPU.FUSED_SEPCONV_V3,
        cfg.TPU.FUSED_SEPCONV_MIN_BYTES,
    )
    try:
        cfg.TPU.INT8_ACTIVATIONS = "pw"
        cfg.TPU.FUSED_SEPCONV_MIN_BYTES = 1
        m = XceptionBlock((16, 16, 16), 1, dilation=2, skip_type="sum")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 64, 16),
                              jnp.float32)
        v = m.init(jax.random.PRNGKey(1), x)
        cfg.TPU.FUSED_SEPCONV_V3 = True
        y_f = m.apply(v, x)
        cfg.TPU.FUSED_SEPCONV_V3 = False
        y_x = m.apply(v, x)
        assert y_f.shape == y_x.shape
        rel = float(jnp.abs(y_f - y_x).max() / jnp.abs(y_x).max())
        assert rel < 0.06, rel
    finally:
        os.environ.pop("SEGMENTRON_PALLAS_INTERPRET", None)
        (cfg.TPU.INT8_ACTIVATIONS, cfg.TPU.FUSED_SEPCONV_V3,
         cfg.TPU.FUSED_SEPCONV_MIN_BYTES) = prev
