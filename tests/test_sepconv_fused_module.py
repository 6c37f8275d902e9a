"""SeparableConv2d fused-path integration: eval with the Pallas fast
path (interpret mode, forced via env) must match the regular XLA
module path on the same variables — this validates the shadow variable
declarations and the BN folding inside the module."""

import os

import jax
import numpy as np
import pytest

from segmentron_tpu.config import cfg
from segmentron_tpu.modules import SeparableConv2d
from segmentron_tpu.modules.batch_norm import NormConfig


@pytest.mark.parametrize("relu_first,dilation", [(True, 1), (False, 2)])
def test_fused_module_matches_regular(fresh_cfg, monkeypatch, relu_first, dilation):
    # 128-aligned channels so the fused-path gate admits the shape
    mod = SeparableConv2d(
        features=128, norm=NormConfig(), relu_first=relu_first, dilation=dilation
    )
    rng = np.random.RandomState(0)
    x = rng.randn(1, 16, 24, 128).astype(np.float32)
    variables = mod.init(jax.random.PRNGKey(0), x)
    # make running stats non-trivial so BN folding is actually exercised
    variables = jax.tree.map(lambda a: a, variables)
    import flax

    variables = flax.core.unfreeze(variables)
    for bn in ("dw_bn", "pw_bn"):
        st = variables["batch_stats"][bn]
        st["mean"] = rng.randn(*st["mean"].shape).astype(np.float32) * 0.1
        st["var"] = (rng.rand(*st["var"].shape).astype(np.float32) + 0.5)

    fresh_cfg.TPU.USE_PALLAS_SEPCONV = False
    ref = np.asarray(mod.apply(variables, x))

    fresh_cfg.TPU.USE_PALLAS_SEPCONV = True
    monkeypatch.setenv("SEGMENTRON_PALLAS_INTERPRET", "1")
    import segmentron_tpu.ops.sepconv as sepconv_mod

    calls = []
    real = sepconv_mod.fused_sepconv_infer_v2
    monkeypatch.setattr(
        sepconv_mod, "fused_sepconv_infer_v2",
        lambda *a, **kw: (calls.append(1), real(*a, **kw))[1],
    )
    out = np.asarray(mod.apply(variables, x))

    assert calls, "fused Pallas path was not taken"
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
