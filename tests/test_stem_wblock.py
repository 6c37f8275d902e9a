"""W-blocked stem conv (ops/stem.py): exactness vs the plain XLA conv.

The reformulation must be bit-comparable (up to f32 reduction
reassociation) for every stem geometry in the zoo: Xception/MobileNet
3x3 s2 p1, ResNet 7x7 s2 p3, deep-stem 3x3 s2/s1, HRNet 3x3 s2."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmentron_tpu.config import cfg
from segmentron_tpu.modules.basic import ConvBNReLU
from segmentron_tpu.modules.batch_norm import NormConfig
from segmentron_tpu.ops.stem import pick_block, wblock_conv2d


def _plain(x, w, stride, padding):
    return jax.lax.conv_general_dilated(
        x, w, stride, [(padding[0],) * 2, (padding[1],) * 2],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )


GEOMS = [
    # (k, s, p, H, W, C_in, C_out, block)
    ((3, 3), (2, 2), (1, 1), 33, 64, 3, 16, 16),
    ((3, 3), (2, 2), (1, 1), 16, 24, 3, 8, 8),   # W%16!=0 -> B=8
    ((3, 3), (1, 1), (1, 1), 12, 32, 3, 8, 16),   # stride-1 same
    ((3, 3), (2, 2), (1, 1), 20, 48, 4, 8, 16),   # C_in=4
    ((5, 5), (2, 2), (2, 2), 18, 32, 1, 8, 16),   # 1-channel input
]


@pytest.mark.parametrize("k,s,p,h,w,ci,co,blk", GEOMS)
def test_wblock_exact(k, s, p, h, w, ci, co, blk):
    got_blk = pick_block((1, h, w, ci), k, s, p)
    assert got_blk == blk
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (2, h, w, ci), jnp.float32)
    wt = jax.random.normal(kw, (k[0], k[1], ci, co), jnp.float32) * 0.2
    want = _plain(x, wt, s, p)
    got = wblock_conv2d(x, wt, s, p, got_blk)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_pick_block_rejects_large_kernels():
    # 7x7 measured neutral-to-negative on chip (FCN 508 -> 493 img/s):
    # blocked-kernel zero padding wastes ~7x FLOPs at 7 taps
    assert pick_block((1, 32, 64, 3), (7, 7), (2, 2), (3, 3)) is None


def test_pick_block_rejections():
    # too many channels
    assert pick_block((1, 32, 64, 8), (3, 3), (2, 2), (1, 1)) is None
    # dilation
    assert pick_block((1, 32, 64, 3), (3, 3), (2, 2), (2, 2), (2, 2)) is None
    # groups
    assert pick_block((1, 32, 64, 3), (3, 3), (2, 2), (1, 1), (1, 1), 3) is None
    # valid-padding conv (k - 2p > s) must stay on the plain path
    assert pick_block((1, 32, 64, 3), (3, 3), (1, 1), (0, 0)) is None
    # odd W
    assert pick_block((1, 32, 63, 3), (3, 3), (2, 2), (1, 1)) is None


def test_convbnrelu_wblock_matches_plain():
    """ConvBNReLU with the flag on/off produces identical outputs from
    identical params (the wblock path reads the same 'conv/kernel')."""
    norm = NormConfig()
    mod = ConvBNReLU(32, 3, 2, norm=norm)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 128, 3))
    cfg.defrost()
    old = cfg.TPU.STEM_WBLOCK
    try:
        cfg.TPU.STEM_WBLOCK = False
        v = mod.init(jax.random.PRNGKey(0), x)
        ref = mod.apply(v, x)
        cfg.TPU.STEM_WBLOCK = True
        got = mod.apply(v, x)
    finally:
        cfg.TPU.STEM_WBLOCK = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_wblock_grad_flows():
    """The blocked conv is autodiff-safe: grads wrt the canonical HWIO
    kernel match the plain conv's."""
    k, s, p = (3, 3), (2, 2), (1, 1)
    kx, kw = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kx, (1, 16, 32, 3), jnp.float32)
    wt = jax.random.normal(kw, (3, 3, 3, 8), jnp.float32) * 0.2

    g_plain = jax.grad(lambda w: _plain(x, w, s, p).sum())(wt)
    g_blk = jax.grad(lambda w: wblock_conv2d(x, w, s, p, 8).sum())(wt)
    np.testing.assert_allclose(np.asarray(g_blk), np.asarray(g_plain),
                               rtol=1e-4, atol=1e-3)


def test_resnet_7x7_stem_never_routes_to_wblock():
    """7x7 stems measured negative through wblock (~7x zero-pad FLOP
    waste); pick_block must reject k>5 so classic ResNet stems stay on
    the plain conv, and the ResNet forward is wblock-independent."""
    from segmentron_tpu.models.backbones.resnet import BasicBlock, ResNet
    from segmentron_tpu.ops.stem import pick_block

    assert pick_block((1, 64, 96, 3), (7, 7), (2, 2), (3, 3)) is None
    assert pick_block((1, 1024, 2048, 3), (7, 7), (2, 2), (3, 3)) is None

    norm = NormConfig()
    model = ResNet(layers=(2, 2, 2, 2), block=BasicBlock, norm=norm)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 96, 3))
    cfg.defrost()
    old = cfg.TPU.STEM_WBLOCK
    try:
        cfg.TPU.STEM_WBLOCK = False
        v = model.init(jax.random.PRNGKey(0), x)
        ref = model.apply(v, x)
        cfg.TPU.STEM_WBLOCK = True
        got = model.apply(v, x)
    finally:
        cfg.TPU.STEM_WBLOCK = old
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
