"""Static-int8 inference path (ops/quant.py + module plumbing):
quantized convolutions must track the fp32 path within the error budget
implied by 8-bit symmetric quantization, on the same variables.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmentron_tpu.modules.batch_norm import NormConfig
from segmentron_tpu.ops.quant import (
    QTensor,
    bn_amax,
    bn_folded_affine,
    dequantize,
    qadd,
    qconv,
    qrelu,
    quantize_static,
)


def test_quantize_dequantize_roundtrip(rng):
    x = rng.randn(1, 8, 8, 16).astype(np.float32)
    amax = jnp.full((16,), 4.0)
    q = quantize_static(jnp.asarray(x), amax)
    assert q.q.dtype == jnp.int8
    back = np.asarray(dequantize(q))
    # quantization step = amax/127
    assert np.max(np.abs(back - np.clip(x, -4, 4))) <= 4.0 / 127.0 * 0.5 + 1e-6


def test_qrelu_exact(rng):
    x = rng.randn(1, 4, 4, 8).astype(np.float32)
    q = quantize_static(jnp.asarray(x), jnp.full((8,), 4.0))
    got = np.asarray(dequantize(qrelu(q)))
    want = np.maximum(np.asarray(dequantize(q)), 0)
    np.testing.assert_array_equal(got, want)


def test_qconv_matches_float_conv(rng):
    cin, cout = 16, 24
    x = rng.randn(1, 12, 12, cin).astype(np.float32) * 0.5
    w = (rng.randn(3, 3, cin, cout) / np.sqrt(9 * cin)).astype(np.float32)
    a = (rng.rand(cout) * 0.5 + 0.75).astype(np.float32)
    b = (rng.randn(cout) * 0.1).astype(np.float32)

    q = quantize_static(jnp.asarray(x), jnp.full((cin,), 3.0))
    got = np.asarray(qconv(q, jnp.asarray(w), 1, None, 1,
                           bn_affine=(jnp.asarray(a), jnp.asarray(b)),
                           relu=True))
    ref_in = np.asarray(dequantize(q))  # isolate conv error from input quant
    want = jax.lax.conv_general_dilated(
        jnp.asarray(ref_in), jnp.asarray(w), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    want = np.maximum(np.asarray(want) * a + b, 0)
    scale = max(1.0, np.abs(want).max())
    assert np.max(np.abs(got - want)) <= 0.02 * scale, (
        np.max(np.abs(got - want)), scale)


def test_qconv_depthwise_matches(rng):
    c = 16
    x = rng.randn(1, 10, 10, c).astype(np.float32)
    w = (rng.randn(3, 3, 1, c) / 3.0).astype(np.float32)
    q = quantize_static(jnp.asarray(x), jnp.full((c,), 3.5))
    got = np.asarray(qconv(q, jnp.asarray(w), 1, None, 1, groups=c))
    want = jax.lax.conv_general_dilated(
        jnp.asarray(np.asarray(dequantize(q))), jnp.asarray(w), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    want = np.asarray(want)
    scale = max(1.0, np.abs(want).max())
    assert np.max(np.abs(got - want)) <= 0.02 * scale


def test_qadd_combined_scale(rng):
    a = quantize_static(jnp.asarray(rng.randn(1, 4, 4, 8).astype(np.float32)),
                        jnp.full((8,), 3.0))
    b = quantize_static(jnp.asarray(rng.randn(1, 4, 4, 8).astype(np.float32)),
                        jnp.full((8,), 2.0))
    got = np.asarray(dequantize(qadd(a, b)))
    want = np.asarray(dequantize(a)) + np.asarray(dequantize(b))
    assert np.max(np.abs(got - want)) <= 5.0 / 127.0 + 1e-6


def _randomized_variables(model, x, seed=0):
    """init + non-trivial BN running stats (so folding is exercised)."""
    variables = model.init(jax.random.PRNGKey(seed), x)
    rng = np.random.RandomState(seed)

    def perturb(path, v):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        v = np.asarray(v)
        if name == "mean":
            return jnp.asarray(rng.randn(*v.shape).astype(np.float32) * 0.1)
        if name == "var":
            return jnp.asarray((rng.rand(*v.shape) * 0.5 + 0.75).astype(np.float32))
        return jnp.asarray(v)

    stats = jax.tree_util.tree_map_with_path(perturb, variables["batch_stats"])
    return {"params": variables["params"], "batch_stats": stats}


def test_xception65_int8_tracks_fp32(fresh_cfg):
    """Whole-backbone int8 forward on the SAME variables: every tap must
    track the fp32 forward within the accumulated 8-bit error budget."""
    from segmentron_tpu.models.backbones.xception import Xception65

    fresh_cfg.TPU.INT8_ACTIVATIONS = True
    model = Xception65(output_stride=16, middle_blocks=2, norm=NormConfig())
    x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    variables = _randomized_variables(model, x)

    fresh_cfg.TPU.INT8_ACTIVATIONS = False
    ref = model.apply(variables, x, False)
    fresh_cfg.TPU.INT8_ACTIVATIONS = True
    got = model.apply(variables, x, False)

    for i, (g, r) in enumerate(zip(got, ref)):
        g, r = np.asarray(g), np.asarray(r)
        assert g.shape == r.shape
        rel = np.linalg.norm(g - r) / max(np.linalg.norm(r), 1e-6)
        assert rel < 0.15, (f"c{i + 1}", rel)


def test_sepconv_int8_pw_mode_tracks_fp32(fresh_cfg, rng):
    """Mixed "pw" granularity: bf16 depthwise + int8 pointwise on plain
    arrays must track the fp32 sepconv on the same variables."""
    from segmentron_tpu.modules.basic import SeparableConv2d

    m = SeparableConv2d(24, 3, dilation=2, norm=NormConfig(), relu_first=True)
    x = rng.randn(1, 16, 16, 12).astype(np.float32)
    variables = _randomized_variables(m, x, seed=3)
    fresh_cfg.TPU.INT8_ACTIVATIONS = False
    ref = np.asarray(m.apply(variables, x, False))
    fresh_cfg.TPU.INT8_ACTIVATIONS = "pw"
    got = np.asarray(m.apply(variables, x, False))
    rel = np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-6)
    assert rel < 0.05, rel


def test_deeplab_int8_pw_argmax_agreement(fresh_cfg):
    from segmentron_tpu.models.deeplabv3_plus import DeepLabV3Plus

    fresh_cfg.TPU.INT8_ACTIVATIONS = False
    fresh_cfg.MODEL.XCEPTION.MIDDLE_BLOCKS = 2
    model = DeepLabV3Plus(
        nclass=11, backbone="xception65", aux=False,
        encoder_norm=NormConfig(), decoder_norm=NormConfig(),
        output_stride=16,
    )
    x = np.random.RandomState(2).randn(1, 64, 64, 3).astype(np.float32)
    variables = _randomized_variables(model, x, seed=2)
    ref = np.argmax(np.asarray(model.apply(variables, x, False)[0]), -1)
    fresh_cfg.TPU.INT8_ACTIVATIONS = "pw"
    got = np.argmax(np.asarray(model.apply(variables, x, False)[0]), -1)
    agree = float((got == ref).mean())
    assert agree > 0.97, agree


def test_deeplab_int8_argmax_agreement(fresh_cfg):
    """Flagship model with the knob on: the int8 backbone's final
    segmentation must agree with fp32 on the overwhelming majority of
    pixels (documented accuracy surrogate)."""
    from segmentron_tpu.models.deeplabv3_plus import DeepLabV3Plus

    fresh_cfg.TPU.INT8_ACTIVATIONS = False
    fresh_cfg.MODEL.XCEPTION.MIDDLE_BLOCKS = 2
    model = DeepLabV3Plus(
        nclass=11, backbone="xception65", aux=False,
        encoder_norm=NormConfig(), decoder_norm=NormConfig(),
        output_stride=16,
    )
    x = np.random.RandomState(1).randn(1, 64, 64, 3).astype(np.float32)
    variables = _randomized_variables(model, x, seed=1)

    ref = np.argmax(np.asarray(model.apply(variables, x, False)[0]), -1)
    fresh_cfg.TPU.INT8_ACTIVATIONS = True
    got = np.argmax(np.asarray(model.apply(variables, x, False)[0]), -1)
    agree = float((got == ref).mean())
    assert agree > 0.95, agree
