"""torch->jax weight-converter tests (SURVEY.md §4 hard part: layout
transposes + nested naming). torchvision isn't installed here, so the
oracle is a synthetic torchvision-*named* resnet18 state_dict whose
shapes follow the real layout conventions; the test asserts the
converted tree drops into our flax backbone with exactly matching
treedef + shapes (jax.tree equality would fail loudly otherwise)."""

import numpy as np
import pytest


def _fake_torchvision_resnet18_state():
    """All (name, shape) pairs of torchvision resnet18 (minus fc)."""
    state = {}

    def conv(name, o, i, k):
        state[name + ".weight"] = np.random.RandomState(len(state)).randn(
            o, i, k, k
        ).astype(np.float32)

    def bn(name, c):
        state[name + ".weight"] = np.ones(c, np.float32)
        state[name + ".bias"] = np.zeros(c, np.float32)
        state[name + ".running_mean"] = np.zeros(c, np.float32)
        state[name + ".running_var"] = np.ones(c, np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    chans = [64, 128, 256, 512]
    in_ch = 64
    for li, c in enumerate(chans, start=1):
        for b in range(2):
            p = f"layer{li}.{b}"
            conv(p + ".conv1", c, in_ch if b == 0 else c, 3)
            bn(p + ".bn1", c)
            conv(p + ".conv2", c, c, 3)
            bn(p + ".bn2", c)
            if b == 0 and (li > 1):
                conv(p + ".downsample.0", c, in_ch, 1)
                bn(p + ".downsample.1", c)
        in_ch = c
    return state


def test_convert_resnet18_matches_flax_tree(fresh_cfg):
    import jax
    from segmentron_tpu.models.backbones import get_segmentation_backbone
    from segmentron_tpu.modules.batch_norm import NormConfig
    from segmentron_tpu.utils.torch_convert import convert_resnet_state

    bb = get_segmentation_backbone("resnet18", NormConfig())
    variables = bb.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))

    state = _fake_torchvision_resnet18_state()
    tree = convert_resnet_state(state, (2, 2, 2, 2))

    # converted params must be a sub-tree of the init params with the
    # exact same leaf shapes (conv kernels transposed OIHW->HWIO)
    init_p = jax.tree.map(lambda a: a.shape, variables["params"])
    conv_p = jax.tree.map(lambda a: a.shape, tree["params"])
    for scope, sub in conv_p.items():
        assert scope in init_p, scope
        assert sub == init_p[scope], (scope, sub, init_p[scope])
    init_s = jax.tree.map(lambda a: a.shape, variables["batch_stats"])
    conv_s = jax.tree.map(lambda a: a.shape, tree["batch_stats"])
    for scope, sub in conv_s.items():
        assert sub == init_s[scope], scope

    # kernel layout: torch (O,I,kH,kW) -> flax (kH,kW,I,O)
    k = tree["params"]["conv1"]["kernel"]
    assert k.shape == (7, 7, 3, 64)
    np.testing.assert_allclose(
        k[0, 0, 0, :], state["conv1.weight"][:, 0, 0, 0], rtol=0
    )


def test_roundtrip_torch_flax_torch():
    """torch state -> flax tree -> torch state is the identity."""
    from segmentron_tpu.utils.torch_convert import (
        convert_resnet_state,
        resnet_state_from_flax,
    )

    state = _fake_torchvision_resnet18_state()
    tree = convert_resnet_state(state, (2, 2, 2, 2))
    back = resnet_state_from_flax(tree["params"], tree["batch_stats"])
    assert set(back) == set(state)
    for k in state:
        np.testing.assert_allclose(back[k], state[k], rtol=0, atol=0)


def test_load_backbone_pretrained_merges(fresh_cfg, tmp_path):
    import jax
    import torch
    from segmentron_tpu.config import cfg
    from segmentron_tpu.models import get_segmentation_model
    from segmentron_tpu.utils.torch_convert import load_backbone_pretrained

    cfg.MODEL.MODEL_NAME = "FCN"
    cfg.MODEL.BACKBONE = "resnet18"
    cfg.DATASET.NAME = "synthetic"
    cfg.TRAIN.SYNC_BATCH_NORM = False
    model = get_segmentation_model()
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32)
    )

    state = {k: torch.from_numpy(v) for k, v in
             _fake_torchvision_resnet18_state().items()}
    path = tmp_path / "resnet18.pth"
    torch.save(state, path)

    new_vars = load_backbone_pretrained(variables, "resnet18", str(path))
    got = np.asarray(new_vars["params"]["backbone"]["conv1"]["kernel"])
    want = np.asarray(state["conv1.weight"]).transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want)
    # non-backbone params untouched
    head_before = jax.tree.leaves(variables["params"]["head"])[0]
    head_after = jax.tree.leaves(new_vars["params"]["head"])[0]
    np.testing.assert_allclose(np.asarray(head_before), np.asarray(head_after))


def _fake_torchvision_mobilenet_v2_state():
    def make_div(v, d=8):
        nv = max(d, int(v + d / 2) // d * d)
        if nv < 0.9 * v:
            nv += d
        return nv

    state = {}

    def conv(name, o, i, k, groups=1):
        state[name + ".weight"] = np.random.RandomState(len(state)).randn(
            o, i // groups, k, k
        ).astype(np.float32)

    def bn(name, c):
        state[name + ".weight"] = np.ones(c, np.float32)
        state[name + ".bias"] = np.zeros(c, np.float32)
        state[name + ".running_mean"] = np.zeros(c, np.float32)
        state[name + ".running_var"] = np.ones(c, np.float32)

    settings = ((1, 16, 1), (6, 24, 2), (6, 32, 3), (6, 64, 4), (6, 96, 3),
                (6, 160, 3), (6, 320, 1))
    conv("features.0.0", 32, 3, 3)
    bn("features.0.1", 32)
    in_ch, fi = 32, 1
    for (t, c, n) in settings:
        out = make_div(c)
        for _ in range(n):
            p = f"features.{fi}.conv"
            fi += 1
            hid = in_ch * t
            if t != 1:
                conv(p + ".0.0", hid, in_ch, 1)
                bn(p + ".0.1", hid)
                conv(p + ".1.0", hid, hid, 3, groups=hid)
                bn(p + ".1.1", hid)
                conv(p + ".2", out, hid, 1)
                bn(p + ".3", out)
            else:
                conv(p + ".0.0", hid, hid, 3, groups=hid)
                bn(p + ".0.1", hid)
                conv(p + ".1", out, hid, 1)
                bn(p + ".2", out)
            in_ch = out
    return state


def test_convert_mobilenet_v2_matches_flax_tree(fresh_cfg):
    import jax
    from segmentron_tpu.models.backbones import get_segmentation_backbone
    from segmentron_tpu.modules.batch_norm import NormConfig
    from segmentron_tpu.utils.torch_convert import convert_mobilenet_state

    tree = convert_mobilenet_state(_fake_torchvision_mobilenet_v2_state())
    bb = get_segmentation_backbone("mobilenet_v2", NormConfig())
    v = bb.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
    init_p = jax.tree.map(lambda a: a.shape, v["params"])
    conv_p = jax.tree.map(lambda a: a.shape, tree["params"])
    assert conv_p == init_p
    init_s = jax.tree.map(lambda a: a.shape, v["batch_stats"])
    conv_s = jax.tree.map(lambda a: a.shape, tree["batch_stats"])
    assert conv_s == init_s
