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
