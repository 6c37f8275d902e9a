"""Fused stem kernel (ops/entrychain.py) vs the XLA oracle — exact up
to f32 reassociation, across strip edges, W-block edges and both H
edges (the zero-padding masks)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segmentron_tpu.ops.entrychain import (
    fused_stem, fused_stem_block1, fused_stem_block1_ref, fused_stem_ref,
    stem_block1_supported, stem_supported,
)


def _params(rng, dtype=jnp.float32):
    k1 = jnp.asarray(rng.randn(3, 3, 3, 32) * 0.2, dtype)
    k2 = jnp.asarray(rng.randn(3, 3, 32, 64) * 0.1, dtype)
    a1 = jnp.asarray(rng.rand(32) + 0.5, jnp.float32)
    b1 = jnp.asarray(rng.randn(32) * 0.3, jnp.float32)
    a2 = jnp.asarray(rng.rand(64) + 0.5, jnp.float32)
    b2 = jnp.asarray(rng.randn(64) * 0.3, jnp.float32)
    return k1, a1, b1, k2, a2, b2


def test_stem_supported():
    assert stem_supported(1024, 2048, 3)
    assert stem_supported(128, 64, 3, strip=16)
    assert not stem_supported(1024, 2048, 4)
    assert not stem_supported(1022, 2048, 3)
    assert not stem_supported(64, 2048, 3, strip=32)  # single strip


@pytest.mark.parametrize("h,w,strip", [
    (128, 64, 16),   # several strips, small width (wb=4)
    (96, 96, 8),     # odd-ish geometry
    (64, 160, 16),   # exactly 2 strips -> both edge masks active
])
def test_fused_stem_matches_xla(h, w, strip):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, h, w, 3), jnp.float32)
    params = _params(rng)

    want = np.asarray(fused_stem_ref(x, *params))
    got = np.asarray(fused_stem(x, *params, strip=strip, interpret=True))
    assert got.shape == want.shape == (1, h // 2, w // 2, 64)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", [True, "block1"])
def test_xception_fused_stem_model_parity(fresh_cfg, monkeypatch, mode):
    """TPU.FUSED_STEM ('stem' and 'block1' modes) routes the Xception
    entry through the kernels with the SAME parameter tree — backbone
    outputs must match the regular path (interpret mode on CPU)."""
    from segmentron_tpu.models.backbones import get_segmentation_backbone
    from segmentron_tpu.modules.batch_norm import NormConfig

    monkeypatch.setenv("SEGMENTRON_PALLAS_INTERPRET", "1")
    fresh_cfg.MODEL.OUTPUT_STRIDE = 16
    fresh_cfg.MODEL.XCEPTION.MIDDLE_BLOCKS = 1
    bb = get_segmentation_backbone("xception65", NormConfig())
    x = jnp.asarray(
        np.random.RandomState(0).randn(1, 96, 64, 3), jnp.float32
    )
    variables = bb.init(jax.random.PRNGKey(0), x)

    fresh_cfg.TPU.FUSED_STEM = False
    ref = bb.apply(variables, x, False)
    fresh_cfg.TPU.FUSED_STEM = mode
    got = bb.apply(variables, x, False)
    for i, (g, r) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=1e-4, atol=1e-4,
            err_msg=f"c{i + 1}",
        )


def test_fused_stem_batch2():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    params = _params(rng)
    want = np.asarray(fused_stem_ref(x, *params))
    got = np.asarray(fused_stem(x, *params, strip=16, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _block1_params(rng):
    stem_p = _params(rng)

    def sep(cin, cout):
        return (
            jnp.asarray(rng.randn(3, 3, 1, cin) * 0.2, jnp.float32),
            jnp.asarray(rng.rand(cin) + 0.5, jnp.float32),
            jnp.asarray(rng.randn(cin) * 0.3, jnp.float32),
            jnp.asarray(rng.randn(1, 1, cin, cout) * 0.1, jnp.float32),
            jnp.asarray(rng.rand(cout) + 0.5, jnp.float32),
            jnp.asarray(rng.randn(cout) * 0.3, jnp.float32),
        )

    sep_p = (sep(64, 128), sep(128, 128), sep(128, 128))
    skip_p = (
        jnp.asarray(rng.randn(1, 1, 64, 128) * 0.1, jnp.float32),
        jnp.asarray(rng.rand(128) + 0.5, jnp.float32),
        jnp.asarray(rng.randn(128) * 0.3, jnp.float32),
    )
    return stem_p, sep_p, skip_p


def test_stem_block1_supported():
    assert stem_block1_supported(1024, 2048, 3)
    assert stem_block1_supported(64, 64, 3, strip=4)
    assert not stem_block1_supported(1024, 2048, 3, strip=6)
    assert not stem_block1_supported(1022, 2048, 3)


@pytest.mark.parametrize("h,w,strip", [
    (64, 64, 4),     # 4 strips; both edge masks
    (96, 128, 4),    # non-square
    (64, 192, 8),    # exactly 2 strips at strip 8
])
def test_fused_stem_block1_matches_xla(h, w, strip):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, h, w, 3), jnp.float32)
    stem_p, sep_p, skip_p = _block1_params(rng)

    want = np.asarray(fused_stem_block1_ref(x, stem_p, sep_p, skip_p))
    got = np.asarray(
        fused_stem_block1(x, stem_p, sep_p, skip_p, strip=strip,
                          interpret=True)
    )
    assert got.shape == want.shape == (1, h // 4, w // 4, 128)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_xception_entry_v3_block2_parity(fresh_cfg, monkeypatch):
    """TPU.FUSED_ENTRY_V3="block2" routes the conv-skip entry block2
    through the v3 pallas chain behind the fused stem+block1 kernel
    (pallas->pallas boundary) with the SAME parameter tree — backbone
    outputs must match the regular pw-mode path. int8 requant order
    differs slightly between in-register and materialized paths, so
    the bar is relative like test_xception_block_fused_chain_parity."""
    import jax

    from segmentron_tpu.models.backbones import get_segmentation_backbone
    from segmentron_tpu.modules.batch_norm import NormConfig

    monkeypatch.setenv("SEGMENTRON_PALLAS_INTERPRET", "1")
    fresh_cfg.MODEL.OUTPUT_STRIDE = 16
    fresh_cfg.MODEL.XCEPTION.MIDDLE_BLOCKS = 1
    fresh_cfg.TPU.FUSED_STEM = "block1"
    fresh_cfg.TPU.INT8_ACTIVATIONS = "pw"
    bb = get_segmentation_backbone("xception65", NormConfig())
    x = jnp.asarray(
        np.random.RandomState(3).randn(1, 96, 64, 3), jnp.float32
    )
    variables = bb.init(jax.random.PRNGKey(0), x)

    fresh_cfg.TPU.FUSED_ENTRY_V3 = ""
    ref = bb.apply(variables, x, False)
    fresh_cfg.TPU.FUSED_ENTRY_V3 = "block2"
    got = bb.apply(variables, x, False)
    for i, (g, r) in enumerate(zip(got, ref)):
        g, r = np.asarray(g, np.float32), np.asarray(r, np.float32)
        assert g.shape == r.shape
        rel = float(np.abs(g - r).max() / (np.abs(r).max() + 1e-9))
        assert rel < 0.06, f"c{i + 1}: rel={rel}"
