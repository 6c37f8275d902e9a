"""Model-zoo construction + forward-shape tests (all via the registry,
exactly as the Trainer builds them)."""

import jax
import numpy as np
import pytest

from segmentron_tpu.models import MODEL_REGISTRY, get_segmentation_model

CASES = [
    # (MODEL_NAME, BACKBONE, extra cfg overrides, expected num outputs w/ aux)
    ("FCN", "resnet18", {}, 2),
    ("PSPNet", "resnet18", {}, 2),
    ("DeepLabV3_Plus", "mobilenet_v2", {}, 2),
    ("DeepLabV3_Plus", "xception65", {}, 2),
    ("HRNet", "hrnet_w18_small_v1", {}, 1),
    ("HRNet", "hrnet_w18_small_v1", {"MODEL.HRNET.OCR.ENABLE": True}, 2),
    ("OCNet", "resnet18", {"MODEL.OCNet.OC_ARCH": "base"}, 2),
    ("OCNet", "resnet18", {"MODEL.OCNet.OC_ARCH": "pyramid"}, 2),
    ("OCNet", "resnet18", {"MODEL.OCNet.OC_ARCH": "asp"}, 2),
    ("DANet", "resnet18", {}, 3),
    ("FastSCNN", "", {}, 2),
    ("UNet", "", {}, 1),
    ("BiSeNet", "resnet18", {}, 3),
    ("ICNet", "resnet18", {}, 3),
    ("DenseASPP", "resnet18", {}, 2),
    ("CGNet", "", {}, 1),
    ("CCNet", "resnet18", {}, 2),
    ("DUNet", "resnet18", {}, 2),
    ("LEDNet", "", {}, 1),
    ("EncNet", "resnet18", {}, 3),
    ("ESPNetV2", "eespnet", {}, 1),
    ("HardNet", "", {}, 1),
    ("DFANet", "", {}, 1),
    ("PointRend", "resnet18", {}, 1),
]


@pytest.mark.parametrize("name,backbone,overrides,n_out", CASES)
def test_model_forward_shapes(fresh_cfg, name, backbone, overrides, n_out):
    fresh_cfg.MODEL.MODEL_NAME = name
    fresh_cfg.MODEL.BACKBONE = backbone
    fresh_cfg.DATASET.NAME = "synthetic"
    fresh_cfg.SOLVER.AUX = True
    fresh_cfg.TPU.USE_PALLAS = False
    for k, v in overrides.items():
        node = fresh_cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    model = get_segmentation_model()
    x = np.zeros((1, 64, 64, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    assert len(outs) == n_out
    # Main output is always input-resolution logits. Aux outputs may
    # differ: ICNet's cascade guidance maps stay at /8 and /16 by design
    # (ICNetLoss downsamples targets instead), and EncNet emits a 2-D
    # (B, nclass) semantic-encoding prediction for the SE loss.
    assert outs[0].shape == (1, 64, 64, 19), (name, outs[0].shape)
    for o in outs:
        assert o.shape[-1] == 19 and o.shape[0] == 1, (name, o.shape)
    # backbone params live under the "backbone" scope (LR-split contract);
    # backbone-free models (FastSCNN, UNet) have no such scope
    if backbone:
        assert "backbone" in variables["params"], list(variables["params"])


def test_registry_has_core_models():
    for name in ["FCN", "PSPNet", "DeepLabV3_Plus", "HRNet", "OCNet", "DANet"]:
        assert name in MODEL_REGISTRY


def test_translab_outputs_and_loss(fresh_cfg):
    """TransLab emits (seg logits, 1-ch boundary logits); its composite
    loss derives the boundary target from the mask on device."""
    from segmentron_tpu.solver import get_segmentation_loss

    fresh_cfg.MODEL.MODEL_NAME = "TransLab"
    fresh_cfg.MODEL.BACKBONE = "resnet18"
    fresh_cfg.DATASET.NAME = "transparent11"
    fresh_cfg.TRAIN.SYNC_BATCH_NORM = False
    fresh_cfg.TPU.USE_PALLAS = False
    model = get_segmentation_model()
    x = np.zeros((1, 64, 64, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    seg, boundary = model.apply(variables, x)
    assert seg.shape == (1, 64, 64, 12)
    assert boundary.shape == (1, 64, 64, 1)
    loss_fn = get_segmentation_loss("TransLab")
    tgt = np.random.RandomState(0).randint(0, 12, (1, 64, 64)).astype(np.int32)
    loss = float(loss_fn((seg, boundary), tgt))
    assert np.isfinite(loss) and loss > 0
