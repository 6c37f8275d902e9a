"""Shifted-slice depthwise conv (ops/dwconv.py): exactness vs XLA conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmentron_tpu.config import cfg
from segmentron_tpu.modules.basic import SeparableConv2d
from segmentron_tpu.modules.batch_norm import NormConfig
from segmentron_tpu.ops.dwconv import depthwise_shift3x3, prefer_shift


def _dw_conv(x, k, d):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(d, d), (d, d)], rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
        precision=jax.lax.Precision.HIGHEST,
    )


@pytest.mark.parametrize("d", [1, 2, 12, 18, 36])
@pytest.mark.parametrize("hw", [(16, 24), (7, 9)])
def test_shift_exact(d, hw):
    h, w = hw
    kx, kk = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (2, h, w, 8), jnp.float32)
    k = jax.random.normal(kk, (3, 3, 1, 8), jnp.float32) * 0.3
    want = _dw_conv(x, k, d)
    got = depthwise_shift3x3(x, k, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_prefer_shift_gate():
    assert prefer_shift((3, 3), (1, 1), (12, 12))
    assert prefer_shift((3, 3), (1, 1), (36, 36))
    assert not prefer_shift((3, 3), (1, 1), (6, 6))      # conv wins
    assert not prefer_shift((3, 3), (2, 2), (12, 12))    # strided
    assert not prefer_shift((5, 5), (1, 1), (12, 12))    # 5x5
    assert not prefer_shift((3, 3), (1, 1), (12, 6))     # anisotropic


@pytest.mark.parametrize("int8", [False, "pw"])
def test_sepconv_dw_shift_matches_conv(int8):
    """SeparableConv2d(dilation=12) routed through the shift path equals
    the conv path, in both the bf16 and int8-pw forwards."""
    norm = NormConfig()
    mod = SeparableConv2d(16, 3, dilation=12, norm=norm, relu_first=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 48, 8))
    cfg.defrost()
    old_shift, old_int8 = cfg.TPU.DW_SHIFT, cfg.TPU.INT8_ACTIVATIONS
    try:
        cfg.TPU.INT8_ACTIVATIONS = int8
        cfg.TPU.DW_SHIFT = False
        v = mod.init(jax.random.PRNGKey(0), x)
        ref = mod.apply(v, x)
        cfg.TPU.DW_SHIFT = True
        got = mod.apply(v, x)
    finally:
        cfg.TPU.DW_SHIFT, cfg.TPU.INT8_ACTIVATIONS = old_shift, old_int8
    # int8-pw quantizes the dw->pw hop; bf16-vs-f32 intermediate rounding
    # differs slightly between the two dw formulations there
    tol = dict(rtol=1e-5, atol=1e-4) if int8 is False else dict(
        rtol=0.1, atol=0.15
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **tol)


def test_dw_bwd_shift_routing_parity(fresh_cfg):
    """TPU.DW_BWD_SHIFT routes 3x3 stride-1 SeparableConv2d depthwise
    through the hybrid custom-VJP op with the SAME parameter tree —
    identical forward, autodiff-matching gradients."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from segmentron_tpu.modules.basic import SeparableConv2d
    from segmentron_tpu.modules.batch_norm import NormConfig

    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 8), jnp.float32)
    m = SeparableConv2d(12, 3, stride=1, dilation=2, norm=NormConfig())

    fresh_cfg.TPU.DW_BWD_SHIFT = False
    variables = m.init(jax.random.PRNGKey(0), x)

    def loss(v, train):
        out, _ = m.apply(v, x, train, mutable=["batch_stats"])
        return jnp.sum(out**2)

    ref = loss(variables, True)
    g_ref = jax.grad(lambda p: loss({**variables, "params": p}, True))(
        variables["params"]
    )
    fresh_cfg.TPU.DW_BWD_SHIFT = True
    got = loss(variables, True)
    g_got = jax.grad(lambda p: loss({**variables, "params": p}, True))(
        variables["params"]
    )
    np.testing.assert_allclose(float(ref), float(got), rtol=1e-5)
    ra = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(g_ref)}
    rb = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(g_got)}
    assert set(ra) == set(rb)
    for k in ra:
        np.testing.assert_allclose(
            np.asarray(ra[k]), np.asarray(rb[k]), rtol=1e-4, atol=1e-5,
            err_msg=k,
        )
