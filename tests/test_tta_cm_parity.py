"""Full-pipeline confusion-matrix parity vs torch (VERDICT r2 item 8 —
closing the BASELINE "bit-for-bit class histograms" contract END TO
END, not just per-module logits): the torch replica runs the
reference's complete eval semantics (multi-scale resize + flip +
sliding-window logit stitching + softmax accumulation, SURVEY §3.2) in
eager torch, the jax side runs our compiled TTA stack, and the
confusion matrices are compared.

Cross-framework float forwards can differ at ~1e-6; a pixel whose top-2
accumulated probabilities tie within that noise can legitimately argmax
differently, so the assertion is: identical CM totals, AND every
disagreeing pixel is a measured near-tie in the torch probabilities —
any semantic difference (resize anchoring, window grid, flip axis,
softmax placement) would produce non-tie disagreements and fail.
When zero pixels disagree the CMs are bit-for-bit equal (the usual
outcome on these shapes).
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

import torch_refs as tr
from segmentron_tpu.engine.steps import make_predict_fn
from segmentron_tpu.engine.tta import _grid_positions, multi_scale_predict
from segmentron_tpu.utils.score import confusion_matrix_update
from segmentron_tpu.utils.torch_convert import (
    convert_generic_state,
    convert_resnet_state,
)

jax.config.update("jax_default_matmul_precision", "highest")

NCLASS = 7


# ---------------------------------------------------------------- torch TTA
def torch_sliding(model, img, crop, nclass):
    """Reference sliding-window semantics (pad bottom/right to >= crop,
    stride ceil(crop*2/3), clamped grid, count-normalised logit sum) —
    mirrors engine/tta.py::_sliding_body tap for tap."""
    _, _, h, w = img.shape
    pad_h, pad_w = max(crop - h, 0), max(crop - w, 0)
    ph, pw = h + pad_h, w + pad_w
    padded = F.pad(img, (0, pad_w, 0, pad_h))
    grid = _grid_positions(ph, pw, crop, int(math.ceil(crop * 2.0 / 3.0)))
    canvas = torch.zeros(1, nclass, ph, pw)
    count = torch.zeros(1, 1, ph, pw)
    for y0, x0 in grid:
        win = padded[:, :, y0 : y0 + crop, x0 : x0 + crop]
        logits = model(win)[0].float()
        canvas[:, :, y0 : y0 + crop, x0 : x0 + crop] += logits
        count[:, :, y0 : y0 + crop, x0 : x0 + crop] += 1.0
    return (canvas / count.clamp(min=1.0))[:, :, :h, :w]


def torch_tta(model, img, nclass, scales, flip, crop):
    """Reference multi-scale + flip accumulation (SURVEY §3.2)."""
    _, _, h, w = img.shape
    total = torch.zeros(1, nclass, h, w)
    for s in scales:
        sh, sw = int(h * s + 0.5), int(w * s + 0.5)
        scaled = (
            img
            if (sh, sw) == (h, w)
            else F.interpolate(
                img, (sh, sw), mode="bilinear", align_corners=True
            )
        )
        variants = [scaled]
        if flip:
            variants.append(torch.flip(scaled, [3]))
        for vi, v in enumerate(variants):
            if crop is not None and max(sh, sw) > crop:
                logits = torch_sliding(model, v, crop, nclass)
            else:
                logits = model(v)[0].float()
            probs = torch.softmax(logits, 1)
            if vi == 1:
                probs = torch.flip(probs, [3])
            if probs.shape[2:] != (h, w):
                probs = F.interpolate(
                    probs, (h, w), mode="bilinear", align_corners=True
                )
            total = total + probs
    return total


@pytest.fixture(scope="module")
def fcn_pair():
    """Randomized torch FCN/ResNet-18 + the SAME weights through the
    production converters into the flax FCN."""
    from segmentron_tpu.config import cfg
    from segmentron_tpu.models.fcn import FCN
    from segmentron_tpu.modules.batch_norm import NormConfig

    cfg.defrost()
    snap = cfg.to_dict()
    cfg.MODEL.OUTPUT_STRIDE = 8
    tbb = tr.TorchResNet(tr.TorchBasicBlock, (2, 2, 2, 2), output_stride=8)
    tm = tr.randomize(
        tr.TorchFCN(tbb, 512, NCLASS, aux=False, c3_ch=256), seed=11
    )
    tm.eval()
    state = {k: v.numpy() for k, v in tm.state_dict().items()}
    bb_state = {
        k[len("backbone."):]: v
        for k, v in state.items()
        if k.startswith("backbone.")
    }
    head_state = {
        k: v for k, v in state.items() if not k.startswith("backbone.")
    }
    bb_tree = convert_resnet_state(bb_state, (2, 2, 2, 2))
    head_tree = convert_generic_state(head_state)
    variables = {
        "params": {"backbone": bb_tree["params"], **head_tree["params"]},
        "batch_stats": {
            "backbone": bb_tree["batch_stats"],
            **head_tree["batch_stats"],
        },
    }
    model = FCN(
        nclass=NCLASS, backbone="resnet18", aux=False,
        encoder_norm=NormConfig(), decoder_norm=NormConfig(),
    )
    yield tm, model, variables
    cfg.defrost()
    cfg.clear()
    for k, v in type(cfg)(snap).items():
        dict.__setitem__(cfg, k, v)


def test_full_tta_confusion_matrix_parity(fcn_pair):
    tm, model, variables = fcn_pair
    predict = make_predict_fn(model)
    scales, flip, crop = (0.75, 1.0), True, 32
    rng = np.random.RandomState(3)

    cm_j = np.zeros((NCLASS, NCLASS), np.int64)
    cm_t = np.zeros((NCLASS, NCLASS), np.int64)
    n_disagree, n_pix = 0, 0
    for h, w in ((40, 56), (33, 47)):
        img = rng.randn(1, h, w, 3).astype(np.float32)
        mask = rng.randint(-1, NCLASS, (1, h, w)).astype(np.int32)

        probs_j = np.asarray(
            multi_scale_predict(
                predict, variables, jnp.asarray(img), NCLASS,
                scales=scales, flip=flip, crop_size=crop,
            )
        )
        with torch.no_grad():
            probs_t = (
                torch_tta(
                    tm,
                    torch.from_numpy(img).permute(0, 3, 1, 2),
                    NCLASS, scales, flip, crop,
                )
                .permute(0, 2, 3, 1)
                .numpy()
            )

        pred_j = probs_j.argmax(-1)
        pred_t = probs_t.argmax(-1)
        cm_j += np.asarray(
            confusion_matrix_update(
                jnp.asarray(pred_j), jnp.asarray(mask), NCLASS
            ),
            np.int64,
        )
        cm_t += np.asarray(
            confusion_matrix_update(
                jnp.asarray(pred_t), jnp.asarray(mask), NCLASS
            ),
            np.int64,
        )

        # every pipeline-semantics property must agree to float noise
        np.testing.assert_allclose(probs_j, probs_t, rtol=1e-3, atol=1e-4)
        dis = pred_j != pred_t
        n_disagree += int(dis.sum())
        n_pix += pred_j.size
        if dis.any():
            # disagreements must all be measured near-ties
            p = probs_t[dis]
            top2 = np.sort(p, axis=-1)[:, -2:]
            margins = top2[:, 1] - top2[:, 0]
            assert float(margins.max()) < 5e-3, float(margins.max())

    assert cm_j.sum() == cm_t.sum() > 0
    # near-tie flips move single pixels between CM cells; anything more
    # is a semantics bug
    assert np.abs(cm_j - cm_t).sum() <= 2 * n_disagree
    assert n_disagree <= 0.005 * n_pix, (n_disagree, n_pix)
    if n_disagree == 0:
        np.testing.assert_array_equal(cm_j, cm_t)
