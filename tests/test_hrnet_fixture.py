"""HRNet pretrained-weights contract, end to end (VERDICT r4 #7 — the
second .pth fixture family, covering the hairiest naming: HRNet's
nested transition/branch/fuse Sequentials).

``tests/fixtures/hrnet_w18_small_v1_official_keys.json`` pins the
official HRNet-Image-Classification ``state_dict`` key set and shapes —
backbone keys derived from the spec, classification-head keys
(incre_modules/downsamp_modules/final_layer/classifier) and
``num_batches_tracked`` bookkeeping that the converter must DROP. The
test drives the PRODUCTION chain (resolve_pretrained ->
load_backbone_pretrained) from a real ``.pth`` built to that manifest
into the flax HRNet seg model's variables.
"""

import json
import os

import jax
import numpy as np
import torch

FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "fixtures",
    "hrnet_w18_small_v1_official_keys.json",
)
SPEC_NAME = "hrnet_w18_small_v1"


def _fixture_state():
    with open(FIXTURE) as f:
        manifest = json.load(f)
    rs = np.random.RandomState(7)
    state = {}
    for key, shape in manifest.items():
        if key.endswith("num_batches_tracked"):
            state[key] = torch.tensor(100, dtype=torch.int64)
        elif key.endswith("running_var"):
            state[key] = torch.from_numpy(
                (rs.rand(*shape) + 0.5).astype(np.float32)
            )
        else:
            state[key] = torch.from_numpy(
                (rs.randn(*shape) * 0.1).astype(np.float32)
            )
    return state


def test_fixture_pins_official_keyset():
    with open(FIXTURE) as f:
        manifest = json.load(f)
    # the nested-naming landmines the converter must navigate:
    # stage1 = one 32-ch bottleneck -> 128 out (w18_small_v1 spec)
    assert manifest["transition1.0.0.weight"] == [16, 128, 3, 3]
    assert manifest["transition2.2.0.0.weight"] == [64, 32, 3, 3]  # new branch
    assert manifest["stage2.0.fuse_layers.0.1.0.weight"] == [16, 32, 1, 1]
    assert manifest["stage2.0.fuse_layers.1.0.0.0.weight"] == [32, 16, 3, 3]
    # and the head keys it must drop:
    assert "classifier.weight" in manifest
    assert "incre_modules.0.0.conv1.weight" in manifest
    assert "final_layer.0.weight" in manifest
    assert manifest["bn1.num_batches_tracked"] == []


def test_pth_loads_into_hrnet_seg_variables(fresh_cfg, tmp_path):
    from segmentron_tpu.models.hrnet_seg import HRNetSeg
    from segmentron_tpu.modules.batch_norm import NormConfig
    from segmentron_tpu.utils.download import resolve_pretrained
    from segmentron_tpu.utils.torch_convert import load_backbone_pretrained

    state = _fixture_state()
    pth = tmp_path / "hrnetv2_w18_small_v1.pth"
    torch.save(state, pth)

    path = resolve_pretrained(SPEC_NAME, str(pth))
    assert path == str(pth)

    model = HRNetSeg(nclass=4, backbone=SPEC_NAME, aux=False,
                     encoder_norm=NormConfig(), decoder_norm=NormConfig())
    variables = dict(model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32)
    ))
    loaded = load_backbone_pretrained(variables, SPEC_NAME, path)

    # treedef unchanged (the head keys were dropped, nothing added)
    a = jax.tree.map(lambda v: np.asarray(v).shape, variables["params"])
    b = jax.tree.map(lambda v: np.asarray(v).shape, loaded["params"])
    assert a == b

    bb = loaded["params"]["backbone"]
    # stem conv OIHW -> HWIO
    np.testing.assert_array_equal(
        np.asarray(bb["stem1"]["conv"]["kernel"]),
        state["conv1.weight"].numpy().transpose(2, 3, 1, 0),
    )
    # nested new-branch transition (transition2.2.0.{0,1})
    np.testing.assert_array_equal(
        np.asarray(bb["transition3_2"]["conv"]["kernel"]),
        state["transition2.2.0.0.weight"].numpy().transpose(2, 3, 1, 0),
    )
    # fuse up-path 1x1 + fuse down-path strided 3x3
    np.testing.assert_array_equal(
        np.asarray(bb["stage2_module0"]["fuse0_1_conv"]["kernel"]),
        state["stage2.0.fuse_layers.0.1.0.weight"].numpy().transpose(2, 3, 1, 0),
    )
    np.testing.assert_array_equal(
        np.asarray(bb["stage2_module0"]["fuse1_0_down0_conv"]["kernel"]),
        state["stage2.0.fuse_layers.1.0.0.0.weight"].numpy().transpose(2, 3, 1, 0),
    )
    # BN running stats land in batch_stats
    np.testing.assert_array_equal(
        np.asarray(loaded["batch_stats"]["backbone"]["stem1"]["bn"]["var"]),
        state["bn1.running_var"].numpy(),
    )
    # head params untouched by the merge
    for key in variables["params"]:
        if key == "backbone":
            continue
        for x, y in zip(
            jax.tree.leaves(variables["params"][key]),
            jax.tree.leaves(loaded["params"][key]),
        ):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_manifest_regenerates_identically():
    """The checked-in manifest matches its generator (so a converter/spec
    change that shifts expected keys shows up as a diff here)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(FIXTURE)))
    from make_hrnet_fixture import build_manifest

    with open(FIXTURE) as f:
        manifest = json.load(f)
    assert manifest == {
        k: list(v) for k, v in build_manifest().items()
    }
