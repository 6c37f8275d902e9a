"""Whole-model numerical parity vs torch replicas (VERDICT r1 item 1 —
the evidence chain for the mIoU contract): randomized torch weights ->
production converters -> flax forward must match the torch forward at
every backbone tap and at the final head logits.

Backbones go through the REAL import path (``convert_resnet_state`` /
``convert_mobilenet_state`` / ``convert_hrnet_state`` on torchvision/
official-named replicas; ``convert_generic_state`` for Xception), so a
layout transpose, BN mean/var mix-up, dilation/padding mismatch, or
naming drift anywhere in the chain fails these tests.
"""

import jax
import numpy as np
import pytest
import torch

import torch_refs as tr
from segmentron_tpu.utils.torch_convert import (
    convert_generic_state,
    convert_hrnet_state,
    convert_mobilenet_state,
    convert_resnet_state,
    convert_generic_state as generic,
)

jax.config.update("jax_default_matmul_precision", "highest")


def _nchw(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)


def _assert_close(got, want_torch, tol, what=""):
    want = want_torch.detach().permute(0, 2, 3, 1).numpy()
    got = np.asarray(got)
    assert got.shape == want.shape, (what, got.shape, want.shape)
    scale = max(1.0, float(np.abs(want).max()))
    err = float(np.max(np.abs(got - want)))
    assert err <= tol * scale, (what, err, scale)


def _state(model):
    return {k: v.numpy() for k, v in model.state_dict().items()}


def _check_backbone(flax_bb, tree, tmodel, x, tol=2e-4):
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}
    # guard: converted tree must exactly match the flax init treedef
    init = flax_bb.init(jax.random.PRNGKey(0), x)
    for col in ("params", "batch_stats"):
        a = jax.tree.map(lambda v: v.shape, init[col])
        b = jax.tree.map(lambda v: np.asarray(v).shape, variables[col])
        assert a == b, col
    got = flax_bb.apply(variables, x, False)
    with torch.no_grad():
        want = tmodel(_nchw(x))
    for i, (g, w) in enumerate(zip(got, want)):
        _assert_close(g, w, tol, f"c{i + 1}")


@pytest.mark.parametrize("name,block,layers,os_", [
    ("resnet50", tr.TorchBottleneck, (3, 4, 6, 3), 8),
    ("resnet18", tr.TorchBasicBlock, (2, 2, 2, 2), 16),
])
def test_resnet_backbone_parity(fresh_cfg, name, block, layers, os_):
    from segmentron_tpu.models.backbones import get_segmentation_backbone
    from segmentron_tpu.modules.batch_norm import NormConfig

    fresh_cfg.MODEL.OUTPUT_STRIDE = os_
    tm = tr.randomize(tr.TorchResNet(block, layers, output_stride=os_), seed=1)
    tree = convert_resnet_state(_state(tm), layers)
    bb = get_segmentation_backbone(name, NormConfig())
    x = np.random.RandomState(0).randn(1, 65, 65, 3).astype(np.float32)
    _check_backbone(bb, tree, tm, x)


def test_mobilenet_v2_backbone_parity(fresh_cfg):
    from segmentron_tpu.models.backbones import get_segmentation_backbone
    from segmentron_tpu.modules.batch_norm import NormConfig

    fresh_cfg.MODEL.OUTPUT_STRIDE = 16
    tm = tr.randomize(tr.TorchMobileNetV2(output_stride=16), seed=2)
    tree = convert_mobilenet_state(_state(tm))
    bb = get_segmentation_backbone("mobilenet_v2", NormConfig())
    x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    _check_backbone(bb, tree, tm, x)


def test_hrnet_backbone_parity(fresh_cfg):
    from segmentron_tpu.models.backbones import get_segmentation_backbone
    from segmentron_tpu.models.backbones.hrnet import HRNET_SPECS
    from segmentron_tpu.modules.batch_norm import NormConfig

    spec = HRNET_SPECS["hrnet_w18_small_v1"]
    tm = tr.randomize(tr.TorchHRNet(spec), seed=3)
    tree = convert_hrnet_state(_state(tm), spec)
    bb = get_segmentation_backbone("hrnet_w18_small_v1", NormConfig())
    x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    _check_backbone(bb, tree, tm, x)


@pytest.mark.parametrize("os_", [16, 8])
def test_xception65_backbone_parity(fresh_cfg, os_):
    from segmentron_tpu.models.backbones import get_segmentation_backbone
    from segmentron_tpu.modules.batch_norm import NormConfig

    fresh_cfg.MODEL.OUTPUT_STRIDE = os_
    tm = tr.randomize(tr.TorchXception65(output_stride=os_), seed=4)
    tree = convert_generic_state(_state(tm))
    bb = get_segmentation_backbone("xception65", NormConfig())
    x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    # deeper net -> slightly looser tolerance
    _check_backbone(bb, tree, tm, x, tol=5e-4)


def test_fcn_resnet50_full_model_parity(fresh_cfg):
    """Converted ResNet-50 + FCN head: final (and aux) logits match."""
    from segmentron_tpu.models.fcn import FCN
    from segmentron_tpu.modules.batch_norm import NormConfig

    fresh_cfg.MODEL.OUTPUT_STRIDE = 8
    nclass = 7
    tbb = tr.TorchResNet(tr.TorchBottleneck, (3, 4, 6, 3), output_stride=8)
    tm = tr.randomize(tr.TorchFCN(tbb, 2048, nclass, aux=True, c3_ch=1024),
                      seed=5)
    state = _state(tm)
    bb_state = {k[len("backbone."):]: v for k, v in state.items()
                if k.startswith("backbone.")}
    head_state = {k: v for k, v in state.items()
                  if not k.startswith("backbone.")}
    bb_tree = convert_resnet_state(bb_state, (3, 4, 6, 3))
    head_tree = generic(head_state)
    variables = {
        "params": {"backbone": bb_tree["params"], **head_tree["params"]},
        "batch_stats": {"backbone": bb_tree["batch_stats"],
                        **head_tree["batch_stats"]},
    }
    model = FCN(nclass=nclass, backbone="resnet50", aux=True,
                encoder_norm=NormConfig(), decoder_norm=NormConfig())
    x = np.random.RandomState(0).randn(1, 65, 65, 3).astype(np.float32)
    got = model.apply(variables, x, False)
    with torch.no_grad():
        want = tm(_nchw(x))
    _assert_close(got[0], want[0], 5e-4, "main logits")
    _assert_close(got[1], want[1], 5e-4, "aux logits")


def test_deeplabv3plus_xception65_full_model_parity(fresh_cfg):
    """The flagship config (#3): converted Xception-65 + ASPP + decoder
    logits match torch end to end."""
    from segmentron_tpu.models.deeplabv3_plus import DeepLabV3Plus
    from segmentron_tpu.modules.batch_norm import NormConfig

    fresh_cfg.MODEL.OUTPUT_STRIDE = 16
    nclass = 5
    tbb = tr.TorchXception65(output_stride=16)
    tm = tr.randomize(tr.TorchDeepLabV3Plus(tbb, nclass, output_stride=16),
                      seed=6)
    tree = convert_generic_state(_state(tm))
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}
    model = DeepLabV3Plus(
        nclass=nclass, backbone="xception65", aux=False,
        encoder_norm=NormConfig(), decoder_norm=NormConfig(),
        use_aspp=True, enable_decoder=True, aspp_sep=True, decoder_sep=True,
        output_stride=16,
    )
    init = model.init(jax.random.PRNGKey(0),
                      np.zeros((1, 64, 64, 3), np.float32))
    for col in ("params", "batch_stats"):
        a = jax.tree.map(lambda v: v.shape, init[col])
        b = jax.tree.map(lambda v: np.asarray(v).shape, variables[col])
        assert a == b, col
    x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    got = model.apply(variables, x, False)
    with torch.no_grad():
        want = tm(_nchw(x))
    _assert_close(got[0], want[0], 1e-3, "main logits")


def test_pspnet_resnet101_full_model_parity(fresh_cfg):
    """Config #2: converted ResNet-101 (OS8) + PSP head + aux logits
    match torch end to end."""
    from segmentron_tpu.models.pspnet import PSPNet
    from segmentron_tpu.modules.batch_norm import NormConfig

    fresh_cfg.MODEL.OUTPUT_STRIDE = 8
    nclass = 6
    layers = (3, 4, 23, 3)
    tbb = tr.TorchResNet(tr.TorchBottleneck, layers, output_stride=8)
    tm = tr.randomize(
        tr.TorchPSPNet(tbb, 2048, nclass, aux=True, c3_ch=1024), seed=7
    )
    state = _state(tm)
    bb_state = {k[len("backbone."):]: v for k, v in state.items()
                if k.startswith("backbone.")}
    head_state = {k: v for k, v in state.items()
                  if not k.startswith("backbone.")}
    bb_tree = convert_resnet_state(bb_state, layers)
    head_tree = generic(head_state)
    variables = {
        "params": {"backbone": bb_tree["params"], **head_tree["params"]},
        "batch_stats": {"backbone": bb_tree["batch_stats"],
                        **head_tree["batch_stats"]},
    }
    model = PSPNet(nclass=nclass, backbone="resnet101", aux=True,
                   encoder_norm=NormConfig(), decoder_norm=NormConfig())
    init = model.init(jax.random.PRNGKey(0),
                      np.zeros((1, 65, 65, 3), np.float32))
    for col in ("params", "batch_stats"):
        a = jax.tree.map(lambda v: v.shape, init[col])
        b = jax.tree.map(lambda v: np.asarray(v).shape, variables[col])
        assert a == b, col
    x = np.random.RandomState(0).randn(1, 65, 65, 3).astype(np.float32)
    got = model.apply(variables, x, False)
    with torch.no_grad():
        want = tm(_nchw(x))
    _assert_close(got[0], want[0], 1e-3, "main logits")
    _assert_close(got[1], want[1], 1e-3, "aux logits")


def test_danet_resnet101_full_model_parity(fresh_cfg):
    """Config #5a: converted multi-grid ResNet-101 (OS8) + PAM/CAM dual
    attention; all three logits match torch end to end."""
    from segmentron_tpu.models.danet import DANet
    from segmentron_tpu.modules.batch_norm import NormConfig

    fresh_cfg.MODEL.OUTPUT_STRIDE = 8
    fresh_cfg.MODEL.DANET.MULTI_GRID = True
    fresh_cfg.MODEL.DANET.MULTI_DILATION = [4, 8, 16]
    nclass = 5
    layers = (3, 4, 23, 3)
    tbb = tr.TorchResNet(tr.TorchBottleneck, layers, output_stride=8,
                         multi_dilation=(4, 8, 16))
    tm = tr.randomize(tr.TorchDANet(tbb, 2048, nclass, aux=True), seed=8)
    state = _state(tm)
    bb_state = {k[len("backbone."):]: v for k, v in state.items()
                if k.startswith("backbone.")}
    head_state = {k: v for k, v in state.items()
                  if not k.startswith("backbone.")}
    bb_tree = convert_resnet_state(bb_state, layers)
    head_tree = generic(head_state)
    variables = {
        "params": {"backbone": bb_tree["params"], **head_tree["params"]},
        "batch_stats": {"backbone": bb_tree["batch_stats"],
                        **head_tree["batch_stats"]},
    }
    model = DANet(nclass=nclass, backbone="resnet101", aux=True,
                  encoder_norm=NormConfig(), decoder_norm=NormConfig())
    init = model.init(jax.random.PRNGKey(0),
                      np.zeros((1, 65, 65, 3), np.float32))
    for col in ("params", "batch_stats"):
        a = jax.tree.map(lambda v: v.shape, init[col])
        b = jax.tree.map(lambda v: np.asarray(v).shape, variables[col])
        assert a == b, col
    x = np.random.RandomState(1).randn(1, 65, 65, 3).astype(np.float32)
    got = model.apply(variables, x, False)
    with torch.no_grad():
        want = tm(_nchw(x))
    _assert_close(got[0], want[0], 1e-3, "fused logits")
    _assert_close(got[1], want[1], 1e-3, "pam logits")
    _assert_close(got[2], want[2], 1e-3, "cam logits")


def test_ocnet_resnet101_full_model_parity(fresh_cfg):
    """Config #5b: converted ResNet-101 (OS8) + base OC module; main and
    aux logits match torch end to end."""
    from segmentron_tpu.models.ocnet import OCNet
    from segmentron_tpu.modules.batch_norm import NormConfig

    fresh_cfg.MODEL.OUTPUT_STRIDE = 8
    nclass = 5
    layers = (3, 4, 23, 3)
    tbb = tr.TorchResNet(tr.TorchBottleneck, layers, output_stride=8)
    tm = tr.randomize(
        tr.TorchOCNet(tbb, 2048, nclass, aux=True, c3_ch=1024), seed=9
    )
    state = _state(tm)
    bb_state = {k[len("backbone."):]: v for k, v in state.items()
                if k.startswith("backbone.")}
    head_state = {k: v for k, v in state.items()
                  if not k.startswith("backbone.")}
    bb_tree = convert_resnet_state(bb_state, layers)
    head_tree = generic(head_state)
    variables = {
        "params": {"backbone": bb_tree["params"], **head_tree["params"]},
        "batch_stats": {"backbone": bb_tree["batch_stats"],
                        **head_tree["batch_stats"]},
    }
    model = OCNet(nclass=nclass, backbone="resnet101", aux=True,
                  encoder_norm=NormConfig(), decoder_norm=NormConfig(),
                  oc_arch="base")
    init = model.init(jax.random.PRNGKey(0),
                      np.zeros((1, 65, 65, 3), np.float32))
    for col in ("params", "batch_stats"):
        a = jax.tree.map(lambda v: v.shape, init[col])
        b = jax.tree.map(lambda v: np.asarray(v).shape, variables[col])
        assert a == b, col
    x = np.random.RandomState(2).randn(1, 65, 65, 3).astype(np.float32)
    got = model.apply(variables, x, False)
    with torch.no_grad():
        want = tm(_nchw(x))
    _assert_close(got[0], want[0], 1e-3, "main logits")
    _assert_close(got[1], want[1], 1e-3, "aux logits")


def test_hrnet_ocr_full_model_parity(fresh_cfg):
    """Config #4: converted HRNet (official naming) + OCR head; main and
    soft-region (aux) logits match torch end to end. Uses the w18_small
    spec — the OCR head logic is width-independent, so this pins the
    same conversion/numerics chain as W48 at CPU-test cost."""
    from segmentron_tpu.models.backbones.hrnet import HRNET_SPECS
    from segmentron_tpu.models.hrnet_seg import HRNetSeg
    from segmentron_tpu.modules.batch_norm import NormConfig

    nclass = 5
    spec = HRNET_SPECS["hrnet_w18_small_v1"]
    tm = tr.randomize(tr.TorchHRNetSegOCR(spec, nclass), seed=10)
    state = _state(tm)
    bb_state = {k[len("backbone."):]: v for k, v in state.items()
                if k.startswith("backbone.")}
    head_state = {k: v for k, v in state.items()
                  if not k.startswith("backbone.")}
    bb_tree = convert_hrnet_state(bb_state, spec)
    head_tree = generic(head_state)
    variables = {
        "params": {"backbone": bb_tree["params"], **head_tree["params"]},
        "batch_stats": {"backbone": bb_tree["batch_stats"],
                        **head_tree["batch_stats"]},
    }
    model = HRNetSeg(nclass=nclass, backbone="hrnet_w18_small_v1",
                     encoder_norm=NormConfig(), decoder_norm=NormConfig(),
                     ocr_enable=True)
    init = model.init(jax.random.PRNGKey(0),
                      np.zeros((1, 64, 64, 3), np.float32))
    for col in ("params", "batch_stats"):
        a = jax.tree.map(lambda v: v.shape, init[col])
        b = jax.tree.map(lambda v: np.asarray(v).shape, variables[col])
        assert a == b, col
    x = np.random.RandomState(3).randn(1, 64, 64, 3).astype(np.float32)
    got = model.apply(variables, x, False)
    with torch.no_grad():
        want = tm(_nchw(x))
    _assert_close(got[0], want[0], 1e-3, "ocr logits")
    _assert_close(got[1], want[1], 1e-3, "region (aux) logits")


# ===================================== wave-2 zoo oracles (VERDICT r4 #6)
def _split_resnet(tm, layers):
    """state_dict -> converted {backbone, head} variables via the REAL
    resnet import path + the generic head mapper (test_fcn pattern)."""
    state = _state(tm)
    bb_state = {k[len("backbone."):]: v for k, v in state.items()
                if k.startswith("backbone.")}
    head_state = {k: v for k, v in state.items()
                  if not k.startswith("backbone.")}
    bb_tree = convert_resnet_state(bb_state, layers)
    head_tree = generic(head_state)
    return {
        "params": {"backbone": bb_tree["params"], **head_tree["params"]},
        "batch_stats": {"backbone": bb_tree["batch_stats"],
                        **head_tree["batch_stats"]},
    }


def test_fast_scnn_full_model_parity(fresh_cfg):
    """Fast-SCNN: learning-to-downsample + inverted residuals + PPM +
    FFM + aux — no backbone, everything through the generic mapper."""
    from segmentron_tpu.models.fast_scnn import FastSCNN
    from segmentron_tpu.modules.batch_norm import NormConfig

    nclass = 6
    tm = tr.randomize(tr.TorchFastSCNN(nclass, aux=True), seed=11)
    tree = convert_generic_state(_state(tm))
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}
    model = FastSCNN(nclass=nclass, backbone="", aux=True,
                     encoder_norm=NormConfig(), decoder_norm=NormConfig())
    x = np.random.RandomState(0).randn(1, 192, 192, 3).astype(np.float32)
    got = model.apply(variables, x, False)
    with torch.no_grad():
        want = tm(_nchw(x))
    _assert_close(got[0], want[0], 1e-3, "main logits")
    _assert_close(got[1], want[1], 1e-3, "aux logits")


def test_bisenet_full_model_parity(fresh_cfg):
    """BiSeNet: spatial path + ARM/FFM context path over resnet18."""
    from segmentron_tpu.models.bisenet import BiSeNet
    from segmentron_tpu.modules.batch_norm import NormConfig

    fresh_cfg.MODEL.OUTPUT_STRIDE = 8
    nclass = 5
    tbb = tr.TorchResNet(tr.TorchBasicBlock, (2, 2, 2, 2), output_stride=8)
    tm = tr.randomize(
        tr.TorchBiSeNet(tbb, c3_ch=256, c4_ch=512, nclass=nclass, aux=True),
        seed=12,
    )
    variables = _split_resnet(tm, (2, 2, 2, 2))
    model = BiSeNet(nclass=nclass, backbone="resnet18", aux=True,
                    encoder_norm=NormConfig(), decoder_norm=NormConfig())
    x = np.random.RandomState(1).randn(1, 64, 64, 3).astype(np.float32)
    got = model.apply(variables, x, False)
    with torch.no_grad():
        want = tm(_nchw(x))
    assert len(got) == len(want) == 3
    for i, what in enumerate(("main", "aux3", "aux4")):
        _assert_close(got[i], want[i], 1e-3, what)


def test_icnet_full_model_parity(fresh_cfg):
    """ICNet: cascade branches with the SHARED backbone run at 1/2 and
    1/4 scale + PPM + two CFF fusions + cascade aux outputs."""
    from segmentron_tpu.models.icnet import ICNet
    from segmentron_tpu.modules.batch_norm import NormConfig

    fresh_cfg.MODEL.OUTPUT_STRIDE = 8
    nclass = 4
    tbb = tr.TorchResNet(tr.TorchBasicBlock, (2, 2, 2, 2), output_stride=8)
    tm = tr.randomize(
        tr.TorchICNet(tbb, c2_ch=128, c4_ch=512, nclass=nclass), seed=13
    )
    variables = _split_resnet(tm, (2, 2, 2, 2))
    model = ICNet(nclass=nclass, backbone="resnet18", aux=False,
                  encoder_norm=NormConfig(), decoder_norm=NormConfig())
    x = np.random.RandomState(2).randn(1, 192, 192, 3).astype(np.float32)
    got = model.apply(variables, x, False)
    with torch.no_grad():
        want = tm(_nchw(x))
    for i, what in enumerate(("final", "aux /8", "aux /16")):
        _assert_close(got[i], want[i], 1e-3, what)


def test_encnet_full_model_parity(fresh_cfg):
    """EncNet: context-encoding codebook (softmax assignment over
    squared distances), SE gate, SE-loss presence logits, laterals."""
    from segmentron_tpu.models.encnet import EncNet
    from segmentron_tpu.modules.batch_norm import NormConfig

    fresh_cfg.MODEL.OUTPUT_STRIDE = 8
    nclass = 5
    tbb = tr.TorchResNet(tr.TorchBasicBlock, (2, 2, 2, 2), output_stride=8)
    tm = tr.randomize(
        tr.TorchEncNet(tbb, c2_ch=128, c3_ch=256, c4_ch=512, nclass=nclass,
                       lateral=True, se_loss=True, aux=True),
        seed=14,
    )
    variables = _split_resnet(tm, (2, 2, 2, 2))
    model = EncNet(nclass=nclass, backbone="resnet18", aux=True,
                   se_loss=True, lateral=True,
                   encoder_norm=NormConfig(), decoder_norm=NormConfig())
    x = np.random.RandomState(3).randn(1, 64, 64, 3).astype(np.float32)
    got = model.apply(variables, x, False)
    with torch.no_grad():
        want = tm(_nchw(x))
    _assert_close(got[0], want[0], 1e-3, "main logits")
    # SE presence logits are (b, nclass) — non-spatial compare
    se_got, se_want = np.asarray(got[1]), want[1].numpy()
    assert se_got.shape == se_want.shape
    err = float(np.max(np.abs(se_got - se_want)))
    assert err <= 1e-3 * max(1.0, float(np.abs(se_want).max())), err
    _assert_close(got[2], want[2], 1e-3, "aux logits")


def test_ccnet_full_model_parity(fresh_cfg):
    """CCNet: recurrent criss-cross attention (row+column softmax with
    the masked column diagonal), recurrence=2 with shared weights."""
    from segmentron_tpu.models.ccnet import CCNet
    from segmentron_tpu.modules.batch_norm import NormConfig

    fresh_cfg.MODEL.OUTPUT_STRIDE = 8
    nclass = 5
    tbb = tr.TorchResNet(tr.TorchBasicBlock, (2, 2, 2, 2), output_stride=8)
    tm = tr.randomize(
        tr.TorchCCNet(tbb, c3_ch=256, c4_ch=512, nclass=nclass,
                      recurrence=2, aux=True),
        seed=15,
    )
    variables = _split_resnet(tm, (2, 2, 2, 2))
    model = CCNet(nclass=nclass, backbone="resnet18", aux=True, recurrence=2,
                  encoder_norm=NormConfig(), decoder_norm=NormConfig())
    x = np.random.RandomState(4).randn(1, 64, 64, 3).astype(np.float32)
    got = model.apply(variables, x, False)
    with torch.no_grad():
        want = tm(_nchw(x))
    _assert_close(got[0], want[0], 1e-3, "main logits")
    _assert_close(got[1], want[1], 1e-3, "aux logits")


# ===================================== wave-3 zoo oracles (round 5):
# every remaining CASES row gets a full-model torch oracle so semantic
# drift (not just shape drift) is visible suite-wide.
def test_unet_full_model_parity(fresh_cfg):
    """UNet: symmetric encoder-decoder with skip concats; everything
    through the generic mapper (no backbone)."""
    from segmentron_tpu.models.unet import UNet
    from segmentron_tpu.modules.batch_norm import NormConfig

    nclass = 4
    tm = tr.randomize(tr.TorchUNet(nclass), seed=16)
    tree = convert_generic_state(_state(tm))
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}
    model = UNet(nclass=nclass, backbone="", aux=False,
                 encoder_norm=NormConfig(), decoder_norm=NormConfig())
    x = np.random.RandomState(5).randn(1, 64, 64, 3).astype(np.float32)
    got = model.apply(variables, x, False)
    with torch.no_grad():
        want = tm(_nchw(x))
    _assert_close(got[0], want[0], 1e-3, "logits")


def test_denseaspp_full_model_parity(fresh_cfg):
    """DenseASPP: densely-connected atrous stack (each layer eats the
    concat of all previous) over resnet18 + aux head."""
    from segmentron_tpu.models.denseaspp import DenseASPP
    from segmentron_tpu.modules.batch_norm import NormConfig

    fresh_cfg.MODEL.OUTPUT_STRIDE = 8
    nclass = 5
    tbb = tr.TorchResNet(tr.TorchBasicBlock, (2, 2, 2, 2), output_stride=8)
    tm = tr.randomize(
        tr.TorchDenseASPP(tbb, c4_ch=512, nclass=nclass, c3_ch=256, aux=True),
        seed=17,
    )
    variables = _split_resnet(tm, (2, 2, 2, 2))
    model = DenseASPP(nclass=nclass, backbone="resnet18", aux=True,
                      encoder_norm=NormConfig(), decoder_norm=NormConfig())
    x = np.random.RandomState(6).randn(1, 64, 64, 3).astype(np.float32)
    got = model.apply(variables, x, False)
    with torch.no_grad():
        want = tm(_nchw(x))
    _assert_close(got[0], want[0], 1e-3, "main logits")
    _assert_close(got[1], want[1], 1e-3, "aux logits")


def test_dunet_full_model_parity(fresh_cfg):
    """DUNet: c2/c3 fusion + DUpsampling (1x1 projection + the exact
    flax depth-to-space channel decomposition) over resnet18."""
    from segmentron_tpu.models.dunet import DUNet
    from segmentron_tpu.modules.batch_norm import NormConfig

    fresh_cfg.MODEL.OUTPUT_STRIDE = 8
    nclass = 5
    tbb = tr.TorchResNet(tr.TorchBasicBlock, (2, 2, 2, 2), output_stride=8)
    tm = tr.randomize(
        tr.TorchDUNet(tbb, c2_ch=128, c3_ch=256, c4_ch=512, nclass=nclass,
                      scale=8, aux=True),
        seed=18,
    )
    variables = _split_resnet(tm, (2, 2, 2, 2))
    model = DUNet(nclass=nclass, backbone="resnet18", aux=True,
                  output_stride=8,
                  encoder_norm=NormConfig(), decoder_norm=NormConfig())
    x = np.random.RandomState(7).randn(1, 64, 64, 3).astype(np.float32)
    got = model.apply(variables, x, False)
    with torch.no_grad():
        want = tm(_nchw(x))
    _assert_close(got[0], want[0], 1e-3, "DUpsampled logits")
    _assert_close(got[1], want[1], 1e-3, "aux logits")


def test_translab_full_model_parity(fresh_cfg):
    """TransLab: boundary stream + boundary-attention-gated decoder;
    both the seg logits and the 1-ch boundary logits must match."""
    from segmentron_tpu.models.translab import TransLab
    from segmentron_tpu.modules.batch_norm import NormConfig

    fresh_cfg.MODEL.OUTPUT_STRIDE = 8
    nclass = 3
    tbb = tr.TorchResNet(tr.TorchBasicBlock, (2, 2, 2, 2), output_stride=8)
    tm = tr.randomize(
        tr.TorchTransLab(tbb, c1_ch=64, c4_ch=512, nclass=nclass), seed=19
    )
    variables = _split_resnet(tm, (2, 2, 2, 2))
    model = TransLab(nclass=nclass, backbone="resnet18", aux=False,
                     encoder_norm=NormConfig(), decoder_norm=NormConfig())
    x = np.random.RandomState(8).randn(1, 64, 64, 3).astype(np.float32)
    got = model.apply(variables, x, False)
    with torch.no_grad():
        want = tm(_nchw(x))
    _assert_close(got[0], want[0], 1e-3, "seg logits")
    _assert_close(got[1], want[1], 1e-3, "boundary logits")


def test_cgnet_full_model_parity(fresh_cfg):
    """CGNet: depthwise loc/sur context pairs, bare-PReLU activations
    (exercises the converter's prelu passthrough), GAP channel gates,
    raw-input injection. Shallow stage-3 (n=6) keeps CPU cost sane while
    covering the dilation-4 blocks and both down variants."""
    from segmentron_tpu.models.cgnet import CGNet
    from segmentron_tpu.modules.batch_norm import NormConfig

    nclass = 5
    tm = tr.randomize(tr.TorchCGNet(nclass, m=3, n=6), seed=20)
    tree = convert_generic_state(_state(tm))
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}
    model = CGNet(nclass=nclass, backbone="", aux=False, m_blocks=3,
                  n_blocks=6,
                  encoder_norm=NormConfig(), decoder_norm=NormConfig())
    x = np.random.RandomState(9).randn(1, 64, 64, 3).astype(np.float32)
    got = model.apply(variables, x, False)
    with torch.no_grad():
        want = tm(_nchw(x))
    _assert_close(got[0], want[0], 1e-3, "logits")


def test_lednet_full_model_parity(fresh_cfg):
    """LEDNet: split-shuffle non-bottlenecks (channel split, factorized
    dilated convs, 2-group shuffle) + the APN attention pyramid head."""
    from segmentron_tpu.models.lednet import LEDNet
    from segmentron_tpu.modules.batch_norm import NormConfig

    nclass = 4
    dil = (1, 2, 5, 9)
    tm = tr.randomize(tr.TorchLEDNet(nclass, dilations=dil), seed=21)
    tree = convert_generic_state(_state(tm))
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}
    model = LEDNet(nclass=nclass, backbone="", aux=False, dilations=dil,
                   encoder_norm=NormConfig(), decoder_norm=NormConfig())
    x = np.random.RandomState(10).randn(1, 128, 128, 3).astype(np.float32)
    got = model.apply(variables, x, False)
    with torch.no_grad():
        want = tm(_nchw(x))
    _assert_close(got[0], want[0], 1e-3, "logits")


def test_hardnet_full_model_parity(fresh_cfg):
    """FC-HarDNet-70: harmonic-link blocks (layer k reads k - 2^i, odd
    layers + last concat out) through encoder AND decoder, with the
    link rule re-derived independently in the torch twin."""
    from segmentron_tpu.models.hardnet import HardNet
    from segmentron_tpu.modules.batch_norm import NormConfig

    nclass = 4
    tm = tr.randomize(tr.TorchHardNet(nclass), seed=22)
    tree = convert_generic_state(_state(tm))
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}
    model = HardNet(nclass=nclass, backbone="", aux=False,
                    encoder_norm=NormConfig(), decoder_norm=NormConfig())
    x = np.random.RandomState(11).randn(1, 128, 128, 3).astype(np.float32)
    got = model.apply(variables, x, False)
    with torch.no_grad():
        want = tm(_nchw(x))
    _assert_close(got[0], want[0], 2e-3, "logits")


def test_dfanet_full_model_parity(fresh_cfg):
    """DFANet: the Xception-A encoder run three times with fc-attention
    re-ingestion (sub-network aggregation) + the summing decoder."""
    from segmentron_tpu.models.dfanet import DFANet
    from segmentron_tpu.modules.batch_norm import NormConfig

    nclass = 4
    tm = tr.randomize(tr.TorchDFANet(nclass), seed=23)
    tree = convert_generic_state(_state(tm))
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}
    model = DFANet(nclass=nclass, backbone="", aux=False,
                   encoder_norm=NormConfig(), decoder_norm=NormConfig())
    x = np.random.RandomState(12).randn(1, 128, 128, 3).astype(np.float32)
    got = model.apply(variables, x, False)
    with torch.no_grad():
        want = tm(_nchw(x))
    _assert_close(got[0], want[0], 2e-3, "logits")


def test_espnetv2_full_model_parity(fresh_cfg):
    """ESPNetV2 over the EESPNet backbone: grouped-pointwise EESP units
    with hierarchical feature fusion, avg-pool shortcuts, raw-image
    re-injection, PSP context and two EESP fusion stages — the whole
    backbone goes through the generic mapper (prelu passthrough)."""
    from segmentron_tpu.models.espnetv2 import ESPNetV2
    from segmentron_tpu.modules.batch_norm import NormConfig

    nclass = 5
    tm = tr.randomize(tr.TorchESPNetV2(nclass), seed=24)
    tree = convert_generic_state(_state(tm))
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}
    model = ESPNetV2(nclass=nclass, backbone="eespnet", aux=False,
                     encoder_norm=NormConfig(), decoder_norm=NormConfig())
    x = np.random.RandomState(13).randn(1, 128, 128, 3).astype(np.float32)
    got = model.apply(variables, x, False)
    with torch.no_grad():
        want = tm(_nchw(x))
    _assert_close(got[0], want[0], 1e-3, "logits")


def test_pointrend_full_model_parity(fresh_cfg):
    """PointRend eval path: DeepLab-style coarse head + two subdivision
    steps of top-K uncertainty selection, grid_sample-equivalent point
    sampling, the point MLP and the scatter re-render. (The train-mode
    point sampling is RNG-driven inside the flax module and is covered
    by the point_sample/top_k oracles + train smoke tests.)"""
    from segmentron_tpu.models.pointrend import PointRend
    from segmentron_tpu.modules.batch_norm import NormConfig

    fresh_cfg.MODEL.OUTPUT_STRIDE = 8
    nclass = 5
    tbb = tr.TorchResNet(tr.TorchBasicBlock, (2, 2, 2, 2), output_stride=8)
    tm = tr.randomize(
        tr.TorchPointRend(tbb, c1_ch=64, c4_ch=512, nclass=nclass,
                          subdivision_steps=2, subdivision_points=64),
        seed=25,
    )
    variables = _split_resnet(tm, (2, 2, 2, 2))
    model = PointRend(nclass=nclass, backbone="resnet18", aux=False,
                      base_model="DeepLabV3_Plus",
                      subdivision_steps=2, subdivision_points=64,
                      encoder_norm=NormConfig(), decoder_norm=NormConfig())
    x = np.random.RandomState(14).randn(1, 64, 64, 3).astype(np.float32)
    got = model.apply(variables, x, False)
    with torch.no_grad():
        want = tm(_nchw(x))
    _assert_close(got[0], want[0], 2e-3, "refined logits")


@pytest.mark.parametrize("arch", ["pyramid", "asp"])
def test_ocnet_variant_full_model_parity(fresh_cfg, arch):
    """The two remaining OC_ARCH variants: pyramid (within-cell
    attention over {1,2,3,6} partitions with zero-pad/crop) and ASP-OC
    (OC block as the ASPP 1x1 branch)."""
    from segmentron_tpu.models.ocnet import OCNet
    from segmentron_tpu.modules.batch_norm import NormConfig

    fresh_cfg.MODEL.OUTPUT_STRIDE = 8
    nclass = 4
    tbb = tr.TorchResNet(tr.TorchBasicBlock, (2, 2, 2, 2), output_stride=8)
    tm = tr.randomize(
        tr.TorchOCNetVariant(tbb, c4_ch=512, nclass=nclass, oc_arch=arch,
                             aux=True, c3_ch=256),
        seed=26,
    )
    variables = _split_resnet(tm, (2, 2, 2, 2))
    model = OCNet(nclass=nclass, backbone="resnet18", aux=True,
                  oc_arch=arch,
                  encoder_norm=NormConfig(), decoder_norm=NormConfig())
    x = np.random.RandomState(15).randn(1, 64, 64, 3).astype(np.float32)
    got = model.apply(variables, x, False)
    with torch.no_grad():
        want = tm(_nchw(x))
    _assert_close(got[0], want[0], 1e-3, "main logits")
    _assert_close(got[1], want[1], 1e-3, "aux logits")


def test_deeplabv3plus_mobilenet_full_model_parity(fresh_cfg):
    """The second DeepLabV3_Plus CASES combination: MobileNetV2 backbone
    (c1 = 24ch low-level tap) through the REAL convert_mobilenet_state
    import path + the same ASPP/decoder head."""
    from segmentron_tpu.models.deeplabv3_plus import DeepLabV3Plus
    from segmentron_tpu.modules.batch_norm import NormConfig

    fresh_cfg.MODEL.OUTPUT_STRIDE = 16
    nclass = 4
    tbb = tr.TorchMobileNetV2(output_stride=16)
    tm = tr.randomize(
        tr.TorchDeepLabV3Plus(tbb, nclass, output_stride=16, c1_ch=24,
                              c4_ch=320),
        seed=27,
    )
    state = _state(tm)
    bb_state = {k[len("backbone."):]: v for k, v in state.items()
                if k.startswith("backbone.")}
    head_state = {k: v for k, v in state.items()
                  if not k.startswith("backbone.")}
    bb_tree = convert_mobilenet_state(bb_state)
    head_tree = generic(head_state)
    variables = {
        "params": {"backbone": bb_tree["params"], **head_tree["params"]},
        "batch_stats": {"backbone": bb_tree["batch_stats"],
                        **head_tree["batch_stats"]},
    }
    model = DeepLabV3Plus(
        nclass=nclass, backbone="mobilenet_v2", aux=False,
        encoder_norm=NormConfig(), decoder_norm=NormConfig(),
        use_aspp=True, enable_decoder=True, aspp_sep=True, decoder_sep=True,
        output_stride=16,
    )
    x = np.random.RandomState(16).randn(1, 64, 64, 3).astype(np.float32)
    got = model.apply(variables, x, False)
    with torch.no_grad():
        want = tm(_nchw(x))
    _assert_close(got[0], want[0], 1e-3, "main logits")
