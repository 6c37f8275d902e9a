"""Xception-65 official-naming torch->flax conversion + the seeded-
cache pretrained acquisition story (VERDICT r2 missing #3 / SURVEY
§2.2 download row): given a cache seeded with torch ``.pth`` files,
``resolve_pretrained`` must hand back a converted ``.npz`` for every
benchmark backbone.
"""

import os

import numpy as np
import pytest


def _fake_xception65_official_state():
    """Aligned-Xception state_dict in the common DeepLab-torch naming
    (conv1/bn1, blockN.rep Sequential, conv3..5+bn3..5) with realistic
    Sequential indices (ReLU entries carry no params)."""
    state = {}
    rng = np.random.RandomState(0)

    def conv(name, o, i, k, dw=False):
        state[name + ".weight"] = rng.randn(
            o, 1 if dw else i, k, k
        ).astype(np.float32)

    def bn(name, c):
        state[name + ".weight"] = rng.rand(c).astype(np.float32) + 0.5
        state[name + ".bias"] = rng.randn(c).astype(np.float32)
        state[name + ".running_mean"] = rng.randn(c).astype(np.float32)
        state[name + ".running_var"] = rng.rand(c).astype(np.float32) + 0.5

    def sep(prefix, i, o):
        conv(prefix + ".conv1", i, i, 3, dw=True)  # depthwise
        bn(prefix + ".bn", i)
        conv(prefix + ".pointwise", o, i, 1)

    def block(bid, in_ch, chans, skip, relu_first=True):
        pref = f"block{bid}."
        if skip:
            conv(pref + "skip", chans[-1], in_ch, 1)
            bn(pref + "skipbn", chans[-1])
        idx = 0 if not relu_first else 1  # leading ReLU consumes a slot
        c = in_ch
        for ch in chans:
            sep(pref + f"rep.{idx}", c, ch)
            idx += 1
            bn(pref + f"rep.{idx}", ch)
            idx += 2  # BN slot + following ReLU slot
            c = ch

    conv("conv1", 32, 3, 3)
    bn("bn1", 32)
    conv("conv2", 64, 32, 3)
    bn("bn2", 64)
    block(1, 64, (128, 128, 128), skip=True, relu_first=False)
    block(2, 128, (256, 256, 256), skip=True)
    block(3, 256, (728, 728, 728), skip=True)
    for bid in range(4, 20):  # 16 middle blocks, identity skip
        block(bid, 728, (728, 728, 728), skip=False)
    block(20, 728, (728, 1024, 1024), skip=True)
    for name, (i, o) in (("conv3", (1024, 1536)), ("conv4", (1536, 1536)),
                         ("conv5", (1536, 2048))):
        sep(name, i, o)
        bn("bn" + name[-1], o)
    return state


def _subtree_shapes_match(conv_tree, init_tree):
    import jax

    init = jax.tree.map(lambda a: a.shape, init_tree)
    conv = jax.tree.map(lambda a: np.asarray(a).shape, conv_tree)
    for scope, sub in conv.items():
        assert scope in init, f"scope {scope!r} not in flax init"
        assert sub == init[scope], (scope, sub, init[scope])


def test_convert_xception65_official_matches_flax_tree(fresh_cfg):
    import jax

    from segmentron_tpu.models.backbones import get_segmentation_backbone
    from segmentron_tpu.modules.batch_norm import NormConfig
    from segmentron_tpu.utils.torch_convert import convert_backbone_state

    fresh_cfg.MODEL.OUTPUT_STRIDE = 16
    fresh_cfg.MODEL.XCEPTION.MIDDLE_BLOCKS = 16
    bb = get_segmentation_backbone("xception65", NormConfig())
    variables = bb.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32)
    )

    state = _fake_xception65_official_state()
    tree = convert_backbone_state("xception65", state)  # .rep. -> official

    _subtree_shapes_match(tree["params"], variables["params"])
    _subtree_shapes_match(tree["batch_stats"], variables["batch_stats"])

    # every separable conv of every block must be covered (no silent
    # partial conversion): 3 stem/entry blocks + 16 middle + exit1 with
    # 3 seps each, plus 3 exit separables
    blocks = [f"block{i}" for i in (1, 2, 3)] + [
        f"middle{i}" for i in range(1, 17)
    ] + ["exit1"]
    for b in blocks:
        for s in ("sep1", "sep2", "sep3"):
            assert "depthwise" in tree["params"][b][s], (b, s)
            assert "pw_bn" in tree["params"][b][s], (b, s)
    for e in ("exit_sep1", "exit_sep2", "exit_sep3"):
        assert "pointwise" in tree["params"][e]

    # layout: torch depthwise (C,1,kH,kW) -> flax (kH,kW,1,C)
    k = np.asarray(tree["params"]["block1"]["sep1"]["depthwise"]["kernel"])
    assert k.shape == (3, 3, 1, 64)
    np.testing.assert_allclose(
        k[0, 0, 0, :], state["block1.rep.0.conv1.weight"][:, 0, 0, 0]
    )


def _fake_resnet_bottleneck_state(layers):
    """torchvision-named ResNet-50/101-style state_dict."""
    state = {}
    rng = np.random.RandomState(1)

    def conv(name, o, i, k):
        state[name + ".weight"] = rng.randn(o, i, k, k).astype(np.float32)

    def bn(name, c):
        state[name + ".weight"] = np.ones(c, np.float32)
        state[name + ".bias"] = np.zeros(c, np.float32)
        state[name + ".running_mean"] = np.zeros(c, np.float32)
        state[name + ".running_var"] = np.ones(c, np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    in_ch = 64
    for li, n in enumerate(layers, start=1):
        ch = 64 * 2 ** (li - 1)
        for b in range(n):
            p = f"layer{li}.{b}"
            conv(p + ".conv1", ch, in_ch, 1)
            bn(p + ".bn1", ch)
            conv(p + ".conv2", ch, ch, 3)
            bn(p + ".bn2", ch)
            conv(p + ".conv3", ch * 4, ch, 1)
            bn(p + ".bn3", ch * 4)
            if in_ch != ch * 4:
                conv(p + ".downsample.0", ch * 4, in_ch, 1)
                bn(p + ".downsample.1", ch * 4)
            in_ch = ch * 4
    return state


def test_resolve_pretrained_converts_all_benchmark_backbones(
    tmp_path, monkeypatch
):
    """Seeded cache -> resolve_pretrained returns a converted .npz for
    every backbone the five BASELINE configs need (the offline
    acquisition walkthrough in docs/PRETRAINED.md, end to end)."""
    torch = pytest.importorskip("torch")
    from test_hrnet_convert import _fake_hrnet_state
    from test_torch_convert import (
        _fake_torchvision_mobilenet_v2_state,
        _fake_torchvision_resnet18_state,
    )

    from segmentron_tpu.models.backbones.hrnet import HRNET_SPECS
    from segmentron_tpu.utils.download import resolve_pretrained
    from segmentron_tpu.utils.torch_convert import load_flax_npz

    monkeypatch.setenv("SEGMENTRON_CACHE", str(tmp_path))
    seeds = {
        "resnet18": _fake_torchvision_resnet18_state(),
        "resnet50": _fake_resnet_bottleneck_state((3, 4, 6, 3)),
        "resnet101": _fake_resnet_bottleneck_state((3, 4, 23, 3)),
        "mobilenet_v2": _fake_torchvision_mobilenet_v2_state(),
        "hrnet_w18_small_v1": _fake_hrnet_state(
            HRNET_SPECS["hrnet_w18_small_v1"]
        ),
        "hrnet_w48": _fake_hrnet_state(HRNET_SPECS["hrnet_w48"]),
        "xception65": _fake_xception65_official_state(),
    }
    for name, state in seeds.items():
        torch.save(
            {k: torch.from_numpy(v) for k, v in state.items()},
            tmp_path / f"{name}.pth",
        )

    for name in seeds:
        # verify=False: synthetic files can't match torch-hub hashes
        path = resolve_pretrained(name, verify=False)
        assert path is not None and path.endswith(".npz"), (name, path)
        tree = load_flax_npz(path)
        assert "params" in tree and tree["params"], name
        # second resolve hits the converted file directly
        assert resolve_pretrained(name, verify=False) == path
