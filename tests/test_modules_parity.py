"""Composite-block parity vs torch oracles written from the paper
definitions (conv->BN->relu, separable conv, ASPP branches, PSP pooling).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from segmentron_tpu.modules import (
    ASPP,
    ConvBNReLU,
    NormConfig,
    PyramidPooling,
    SeparableConv2d,
)
from segmentron_tpu.utils.torch_convert import t2j_bn, t2j_conv_kernel

jax.config.update("jax_default_matmul_precision", "highest")

NORM = NormConfig(bn_type="BN")


def _nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2)


def _nhwc(t):
    return t.detach().permute(0, 2, 3, 1).numpy()


def _rand_bn(c, rng):
    bn = tnn.BatchNorm2d(c)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(rng.rand(c).astype(np.float32) + 0.5))
        bn.bias.copy_(torch.from_numpy(rng.randn(c).astype(np.float32)))
        bn.running_mean.copy_(torch.from_numpy(rng.randn(c).astype(np.float32)))
        bn.running_var.copy_(torch.from_numpy(rng.rand(c).astype(np.float32) + 0.5))
    bn.eval()
    return bn


@pytest.mark.parametrize("stride,dilation", [(1, 1), (2, 1), (1, 2), (1, 4)])
def test_conv_bn_relu_matches_torch(rng, stride, dilation):
    cin, cout, k = 5, 8, 3
    x = rng.randn(2, 17, 19, cin).astype(np.float32)
    tconv = tnn.Conv2d(
        cin, cout, k, stride, padding=dilation * (k - 1) // 2,
        dilation=dilation, bias=False,
    )
    tbn = _rand_bn(cout, rng)
    want = F.relu(tbn(tconv(_nchw(x))))

    m = ConvBNReLU(cout, k, stride, dilation=dilation, norm=NORM)
    variables = m.init(jax.random.PRNGKey(0), x)
    bnv = t2j_bn(tbn)
    variables = {
        "params": {
            "conv": {"kernel": t2j_conv_kernel(tconv.weight)},
            "bn": bnv["params"],
        },
        "batch_stats": {"bn": bnv["batch_stats"]},
    }
    got = m.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), _nhwc(want), rtol=1e-4, atol=1e-4)


def test_separable_conv_matches_torch(rng):
    cin, cout = 6, 10
    x = rng.randn(2, 15, 17, cin).astype(np.float32)
    dw = tnn.Conv2d(cin, cin, 3, 1, padding=2, dilation=2, groups=cin, bias=False)
    dwbn = _rand_bn(cin, rng)
    pw = tnn.Conv2d(cin, cout, 1, bias=False)
    pwbn = _rand_bn(cout, rng)
    want = pwbn(pw(dwbn(dw(F.relu(_nchw(x))))))

    m = SeparableConv2d(cout, 3, dilation=2, norm=NORM, relu_first=True)
    dwv, pwv = t2j_bn(dwbn), t2j_bn(pwbn)
    variables = {
        "params": {
            "depthwise": {"kernel": t2j_conv_kernel(dw.weight)},
            "dw_bn": dwv["params"],
            "pointwise": {"kernel": t2j_conv_kernel(pw.weight)},
            "pw_bn": pwv["params"],
        },
        "batch_stats": {"dw_bn": dwv["batch_stats"], "pw_bn": pwv["batch_stats"]},
    }
    got = m.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), _nhwc(want), rtol=1e-4, atol=1e-4)


def test_pyramid_pooling_shapes(rng):
    x = rng.randn(2, 24, 24, 64).astype(np.float32)
    m = PyramidPooling(norm=NORM)
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (2, 24, 24, 64 + 4 * 16)


@pytest.mark.parametrize("separable", [False, True])
def test_aspp_shapes(rng, separable):
    x = rng.randn(1, 16, 16, 32).astype(np.float32)
    m = ASPP(out_channels=24, atrous_rates=(6, 12, 18), separable=separable, norm=NORM)
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (1, 16, 16, 24)


def test_sync_bn_equals_big_batch_bn(rng):
    """psum-BN over the 8-device mesh must equal single-device big-batch BN
    (SURVEY.md §4 strategy #3)."""
    import flax.linen as nn
    from jax.sharding import Mesh, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) == 8
    c = 4
    x = rng.randn(16, 6, 6, c).astype(np.float32)

    bn_sync = nn.BatchNorm(momentum=0.9, epsilon=1e-5, axis_name="data")
    bn_plain = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
    variables = bn_plain.init(jax.random.PRNGKey(0), x, use_running_average=False)

    # single-device big batch
    want, stats = bn_plain.apply(
        variables, x, use_running_average=False, mutable=["batch_stats"]
    )

    mesh = Mesh(np.asarray(devs), ("data",))

    def step(v, xs):
        y, s = bn_sync.apply(v, xs, use_running_average=False, mutable=["batch_stats"])
        return y, s

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=(P("data"), P()),
        check_vma=False,
    )
    got, got_stats = sharded(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got_stats["batch_stats"]["mean"]),
        np.asarray(stats["batch_stats"]["mean"]),
        rtol=1e-5,
        atol=1e-6,
    )
