"""Pretrained-weights story (VERDICT r1 item 7): converter CLI
roundtrip, .npz load path, and sha256 enforcement in resolve_pretrained.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
import torch

import torch_refs as tr
from segmentron_tpu.utils.download import (
    check_sha256,
    resolve_pretrained,
    url_embedded_hash,
)
from segmentron_tpu.utils.torch_convert import (
    convert_backbone_state,
    load_flax_npz,
    save_flax_npz,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_npz_roundtrip(tmp_path):
    tm = tr.randomize(tr.TorchResNet(tr.TorchBasicBlock, (2, 2, 2, 2)), seed=0)
    state = {k: v.numpy() for k, v in tm.state_dict().items()}
    tree = convert_backbone_state("resnet18", state)
    p = str(tmp_path / "resnet18.npz")
    save_flax_npz(tree, p)
    back = load_flax_npz(p)
    import jax

    a = jax.tree.leaves(tree)
    b = jax.tree.leaves(back)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_convert_weights_cli_roundtrip(tmp_path):
    """torch .pth -> CLI -> .npz -> CLI --reverse -> .pth is identity."""
    tm = tr.randomize(tr.TorchResNet(tr.TorchBasicBlock, (2, 2, 2, 2)), seed=1)
    src = tmp_path / "resnet18.pth"
    npz = tmp_path / "resnet18.npz"
    back = tmp_path / "back.pth"
    torch.save(tm.state_dict(), src)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    for cmd in (
        [sys.executable, "tools/convert_weights.py", "--backbone", "resnet18",
         "--input", str(src), "--output", str(npz)],
        [sys.executable, "tools/convert_weights.py", "--backbone", "resnet18",
         "--reverse", "--input", str(npz), "--output", str(back)],
    ):
        r = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                           text=True, timeout=300)
        assert r.returncode == 0, r.stderr
    orig = tm.state_dict()
    rec = torch.load(back, map_location="cpu", weights_only=False)
    for k, v in orig.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(rec[k].numpy(), v.numpy())


def test_load_backbone_pretrained_accepts_npz(fresh_cfg, tmp_path):
    import jax
    from segmentron_tpu.models import get_segmentation_model
    from segmentron_tpu.utils.torch_convert import load_backbone_pretrained

    fresh_cfg.MODEL.MODEL_NAME = "FCN"
    fresh_cfg.MODEL.BACKBONE = "resnet18"
    fresh_cfg.DATASET.NAME = "synthetic"
    fresh_cfg.TRAIN.SYNC_BATCH_NORM = False
    tm = tr.randomize(tr.TorchResNet(tr.TorchBasicBlock, (2, 2, 2, 2)), seed=2)
    state = {k: v.numpy() for k, v in tm.state_dict().items()}
    tree = convert_backbone_state("resnet18", state)
    p = str(tmp_path / "resnet18.npz")
    save_flax_npz(tree, p)

    model = get_segmentation_model()
    v = model.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
    v2 = load_backbone_pretrained(v, "resnet18", p)
    got = np.asarray(v2["params"]["backbone"]["conv1"]["kernel"])
    np.testing.assert_allclose(
        got, state["conv1.weight"].transpose(2, 3, 1, 0))


def test_url_embedded_hash():
    assert url_embedded_hash(
        "https://download.pytorch.org/models/resnet50-19c8e357.pth"
    ) == "19c8e357"
    assert url_embedded_hash("https://x/y/plainname.pth") is None
    assert url_embedded_hash(None) is None


def test_resolve_pretrained_rejects_corrupt_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("SEGMENTRON_CACHE", str(tmp_path))
    bad = tmp_path / "resnet50.pth"
    bad.write_bytes(b"not a real checkpoint")
    assert not check_sha256(str(bad), "19c8e357")
    with pytest.raises(IOError):
        resolve_pretrained("resnet50")


def test_resolve_pretrained_accepts_npz_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("SEGMENTRON_CACHE", str(tmp_path))
    p = tmp_path / "resnet50.npz"
    save_flax_npz({"params": {"x": np.zeros(1)}}, str(p))
    assert resolve_pretrained("resnet50") == str(p)


def test_load_backbone_pretrained_rejects_shape_drift(fresh_cfg, tmp_path):
    """A converted leaf whose shape disagrees with the model's
    initialized leaf must fail LOUDLY at load time (wrong checkpoint /
    converter layout drift), not surface later as an apply-time
    broadcast error."""
    import jax
    from segmentron_tpu.models import get_segmentation_model
    from segmentron_tpu.utils.torch_convert import load_backbone_pretrained

    fresh_cfg.MODEL.MODEL_NAME = "FCN"
    fresh_cfg.MODEL.BACKBONE = "resnet18"
    fresh_cfg.DATASET.NAME = "synthetic"
    fresh_cfg.TRAIN.SYNC_BATCH_NORM = False
    tm = tr.randomize(tr.TorchResNet(tr.TorchBasicBlock, (2, 2, 2, 2)), seed=3)
    state = {k: v.numpy() for k, v in tm.state_dict().items()}
    tree = convert_backbone_state("resnet18", state)
    # corrupt one leaf's shape as a transposed-layout stand-in
    k = tree["params"]["conv1"]["kernel"]
    tree["params"]["conv1"]["kernel"] = k.transpose(3, 0, 1, 2)
    p = str(tmp_path / "resnet18_bad.npz")
    save_flax_npz(tree, p)

    model = get_segmentation_model()
    v = model.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
    with pytest.raises(ValueError, match="conv1/kernel"):
        load_backbone_pretrained(v, "resnet18", p)


def test_load_backbone_pretrained_rejects_structural_drift(fresh_cfg, tmp_path):
    """A converted tree that puts a LEAF where the model declares a
    SUBTREE (or vice versa) must also fail loudly at load time."""
    import jax
    from segmentron_tpu.models import get_segmentation_model
    from segmentron_tpu.utils.torch_convert import load_backbone_pretrained

    fresh_cfg.MODEL.MODEL_NAME = "FCN"
    fresh_cfg.MODEL.BACKBONE = "resnet18"
    fresh_cfg.DATASET.NAME = "synthetic"
    fresh_cfg.TRAIN.SYNC_BATCH_NORM = False
    tm = tr.randomize(tr.TorchResNet(tr.TorchBasicBlock, (2, 2, 2, 2)), seed=4)
    state = {k: v.numpy() for k, v in tm.state_dict().items()}
    tree = convert_backbone_state("resnet18", state)
    # flatten conv1 (a subtree in the model) down to a bare leaf
    tree["params"]["conv1"] = tree["params"]["conv1"]["kernel"]
    p = str(tmp_path / "resnet18_structural.npz")
    save_flax_npz(tree, p)

    model = get_segmentation_model()
    v = model.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
    with pytest.raises(ValueError, match="conv1"):
        load_backbone_pretrained(v, "resnet18", p)
