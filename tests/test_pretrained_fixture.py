"""Pretrained-weights contract, end to end (VERDICT r3 missing #3).

``tests/fixtures/resnet18_torchvision_keys.json`` pins the exact
torchvision ``resnet18`` state_dict naming and shapes (incl. the
``fc.*`` classifier and ``num_batches_tracked`` bookkeeping the
converter must drop). The tests drive the PRODUCTION chain the trainer
uses (reference: segmentron/utils/download.py + the backbone
``get_backbone(..., pretrained=True)`` path):

    resolve_pretrained -> sha256 gate -> one-time .pth->.npz convert ->
    load_backbone_pretrained -> flax variables merge

so a key-naming drift, missed transpose, or silently-skipped hash check
fails here.
"""

import json
import os

import jax
import numpy as np
import pytest
import torch

FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "fixtures",
    "resnet18_torchvision_keys.json",
)


def _fixture_state():
    """Deterministic state dict with the exact torchvision key set."""
    with open(FIXTURE) as f:
        manifest = json.load(f)
    rs = np.random.RandomState(42)
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


def _init_fcn_r18_variables(fresh_cfg):
    from segmentron_tpu.models.fcn import FCN
    from segmentron_tpu.modules.batch_norm import NormConfig

    fresh_cfg.MODEL.OUTPUT_STRIDE = 32
    model = FCN(nclass=4, backbone="resnet18", aux=False,
                encoder_norm=NormConfig(), decoder_norm=NormConfig())
    return model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32)
    )


def test_fixture_pins_full_torchvision_keyset():
    with open(FIXTURE) as f:
        manifest = json.load(f)
    assert len(manifest) == 122
    assert manifest["fc.weight"] == [1000, 512]
    assert manifest["layer2.0.downsample.0.weight"] == [128, 64, 1, 1]
    assert "layer1.0.downsample.0.weight" not in manifest
    assert manifest["bn1.num_batches_tracked"] == []


def test_explicit_path_loads_into_flax_variables(fresh_cfg, tmp_path):
    """TRAIN.BACKBONE_PRETRAINED_PATH flow: .pth -> converted -> merged,
    with the classifier dropped and layouts transposed."""
    from segmentron_tpu.utils.download import resolve_pretrained
    from segmentron_tpu.utils.torch_convert import load_backbone_pretrained

    state = _fixture_state()
    pth = tmp_path / "resnet18_fixture.pth"
    torch.save(state, pth)

    path = resolve_pretrained("resnet18", str(pth))
    assert path == str(pth)

    variables = dict(_init_fcn_r18_variables(fresh_cfg))
    loaded = load_backbone_pretrained(variables, "resnet18", path)

    # treedef unchanged (merge must not add/drop leaves)
    a = jax.tree.map(lambda v: np.asarray(v).shape, variables["params"])
    b = jax.tree.map(lambda v: np.asarray(v).shape, loaded["params"])
    assert a == b

    bb = loaded["params"]["backbone"]
    # conv kernels arrive OIHW -> HWIO
    np.testing.assert_array_equal(
        np.asarray(bb["conv1"]["kernel"]),
        state["conv1.weight"].numpy().transpose(2, 3, 1, 0),
    )
    np.testing.assert_array_equal(
        np.asarray(bb["layer2_0"]["downsample_conv"]["kernel"]),
        state["layer2.0.downsample.0.weight"].numpy().transpose(2, 3, 1, 0),
    )
    # BN affine -> params, running stats -> batch_stats
    np.testing.assert_array_equal(
        np.asarray(bb["layer4_1"]["bn2"]["scale"]),
        state["layer4.1.bn2.weight"].numpy(),
    )
    np.testing.assert_array_equal(
        np.asarray(loaded["batch_stats"]["backbone"]["bn1"]["var"]),
        state["bn1.running_var"].numpy(),
    )
    # head params untouched
    head_a = jax.tree.leaves(variables["params"]["head"])
    head_b = jax.tree.leaves(loaded["params"]["head"])
    for x, y in zip(head_a, head_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_cache_flow_sha_gate_and_npz_convert(fresh_cfg, tmp_path, monkeypatch):
    """Cache-hit flow: the sha256 gate rejects a file that doesn't match
    the URL-embedded hash, accepts the right one, converts it once to
    .npz, and serves the .npz on the next resolve."""
    import hashlib

    from segmentron_tpu.utils import download
    from segmentron_tpu.utils.torch_convert import load_backbone_pretrained

    monkeypatch.setenv("SEGMENTRON_CACHE", str(tmp_path))
    pth = tmp_path / "resnet18.pth"
    torch.save(_fixture_state(), pth)

    # 1. against the real torch-hub URL hash: our synthetic file must be
    #    REJECTED (the gate actually checks bytes)
    with pytest.raises(IOError):
        download.resolve_pretrained("resnet18")

    # 2. re-pin the URL to this file's true sha256 (torch-hub filename
    #    convention) -> accepted, converted to .npz once
    digest = hashlib.sha256(pth.read_bytes()).hexdigest()[:8]
    monkeypatch.setitem(
        download._URLS,
        "resnet18",
        f"https://download.pytorch.org/models/resnet18-{digest}.pth",
    )
    path = download.resolve_pretrained("resnet18")
    assert path.endswith(".npz") and os.path.isfile(path)

    # 3. npz is served directly afterwards and loads into variables
    assert download.resolve_pretrained("resnet18") == path
    variables = dict(_init_fcn_r18_variables(fresh_cfg))
    loaded = load_backbone_pretrained(variables, "resnet18", path)
    state = _fixture_state()
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["backbone"]["conv1"]["kernel"]),
        state["conv1.weight"].numpy().transpose(2, 3, 1, 0),
    )
