import jax
import numpy as np
import pytest

from segmentron_tpu.modules import NormConfig
from segmentron_tpu.models.backbones import BACKBONE_REGISTRY, get_segmentation_backbone

NORM = NormConfig(bn_type="BN")


@pytest.mark.parametrize("os_,c4_down", [(8, 8), (16, 16)])
def test_resnet50_output_stride(fresh_cfg, os_, c4_down):
    fresh_cfg.MODEL.OUTPUT_STRIDE = os_
    m = get_segmentation_backbone("resnet50", NORM)
    x = np.zeros((1, 64, 64, 3), np.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    c1, c2, c3, c4 = m.apply(variables, x)
    assert c1.shape == (1, 16, 16, 256)
    assert c2.shape == (1, 8, 8, 512)
    assert c4.shape == (1, 64 // c4_down, 64 // c4_down, 2048)


def test_resnet18_shapes(fresh_cfg):
    fresh_cfg.MODEL.OUTPUT_STRIDE = 16
    m = get_segmentation_backbone("resnet18", NORM)
    x = np.zeros((1, 32, 32, 3), np.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    c1, c2, c3, c4 = m.apply(variables, x)
    assert c1.shape[-1] == 64 and c4.shape[-1] == 512


def test_registry_contents():
    for name in ["resnet18", "resnet34", "resnet50", "resnet101", "resnet152"]:
        assert name in BACKBONE_REGISTRY


def test_mobilenet_v2_shapes(fresh_cfg):
    fresh_cfg.MODEL.OUTPUT_STRIDE = 16
    fresh_cfg.MODEL.BACKBONE_SCALE = 1.0
    m = get_segmentation_backbone("mobilenet_v2", NORM)
    x = np.zeros((1, 64, 64, 3), np.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    c1, c2, c3, c4 = m.apply(v, x)
    assert c1.shape == (1, 16, 16, 24)
    assert c2.shape == (1, 8, 8, 32)
    assert c4.shape == (1, 4, 4, 320)
    n_params = sum(p.size for p in jax.tree.leaves(v["params"]))
    assert 1.5e6 < n_params < 2.5e6  # ~1.8M conv trunk


def test_xception65_shapes(fresh_cfg):
    fresh_cfg.MODEL.OUTPUT_STRIDE = 16
    m = get_segmentation_backbone("xception65", NORM)
    x = np.zeros((1, 64, 64, 3), np.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    c1, c2, c3, c4 = m.apply(v, x)
    assert c1.shape == (1, 16, 16, 128)
    assert c2.shape == (1, 8, 8, 256)
    assert c3.shape == (1, 4, 4, 728)
    assert c4.shape == (1, 4, 4, 2048)
    n_params = sum(p.size for p in jax.tree.leaves(v["params"]))
    assert 35e6 < n_params < 45e6  # Xception-65 ~39-41M


def test_hrnet_w18_shapes(fresh_cfg):
    m = get_segmentation_backbone("hrnet_w18", NORM)
    x = np.zeros((1, 64, 64, 3), np.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    c1, c2, c3, c4 = m.apply(v, x)
    assert c1.shape == (1, 16, 16, 18)
    assert c2.shape == (1, 8, 8, 36)
    assert c3.shape == (1, 4, 4, 72)
    assert c4.shape == (1, 2, 2, 144)
    n_params = sum(p.size for p in jax.tree.leaves(v["params"]))
    assert 8.5e6 < n_params < 11e6  # HRNetV2-W18 trunk ~9.6M
