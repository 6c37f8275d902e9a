"""Shape-bucketed whole-image eval (engine/bucketed.py — VERDICT r2
weak #2 / SURVEY §7 "Dynamic shapes"): a variable-size val set must
evaluate with a handful of compiled programs and produce the SAME
confusion matrix as the per-native-shape (unbucketed) TTA path.

At scale 1.0 the sliding windows read identical pixels in both paths,
so the CM matches bit-for-bit; across scales the padded resize matrices
add exact f32 zeros and the CM still matches on every tested input.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segmentron_tpu.config import cfg
from segmentron_tpu.engine.bucketed import BucketedTTA, bucket_for
from segmentron_tpu.engine.steps import make_predict_fn
from segmentron_tpu.engine.tta import multi_scale_predict
from segmentron_tpu.utils.score import SegmentationMetric

NCLASS = 19
SIZES = [(53, 71), (64, 64), (40, 90), (61, 47)]


@pytest.fixture(scope="module")
def model_and_vars():
    from segmentron_tpu.models import get_segmentation_model

    cfg.defrost()
    snap = cfg.to_dict()
    cfg.MODEL.MODEL_NAME = "FCN"
    cfg.MODEL.BACKBONE = "resnet18"
    cfg.MODEL.OUTPUT_STRIDE = 8
    cfg.DATASET.NAME = "synthetic"
    cfg.TRAIN.SYNC_BATCH_NORM = False
    model = get_segmentation_model()  # synthetic dataset: 19 classes
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32)
    )
    yield model, variables
    cfg.defrost()
    cfg.clear()
    for k, v in type(cfg)(snap).items():
        dict.__setitem__(cfg, k, v)


def _data(rng):
    imgs, masks = [], []
    for h, w in SIZES:
        imgs.append(rng.randn(h, w, 3).astype(np.float32))
        m = rng.randint(0, NCLASS, (h, w)).astype(np.int32)
        m[rng.rand(h, w) < 0.1] = -1  # ignore pixels
        masks.append(m)
    return imgs, masks


def _unbucketed_cm(predict_fn, variables, imgs, masks, scales, flip, crop):
    metric = SegmentationMetric(NCLASS)
    for img, msk in zip(imgs, masks):
        probs = multi_scale_predict(
            predict_fn, variables, jnp.asarray(img)[None], NCLASS,
            scales=scales, flip=flip, crop_size=crop,
        )
        metric.update(jnp.argmax(probs, axis=-1), msk[None])
    return metric.class_histogram()


def test_bucket_for():
    assert bucket_for(53, 71, 32) == (64, 96)
    assert bucket_for(64, 64, 32) == (64, 64)
    assert bucket_for(40, 90, 32, floor=128) == (128, 128)


def test_scale1_flip_sliding_bit_identical(model_and_vars, rng):
    model, variables = model_and_vars
    predict_fn = make_predict_fn(model)
    imgs, masks = _data(rng)
    crop = 32

    ref = _unbucketed_cm(
        predict_fn, variables, imgs, masks, (1.0,), True, crop
    )

    tta = BucketedTTA(predict_fn, NCLASS, scales=(1.0,), flip=True,
                      crop_size=crop)
    metric = SegmentationMetric(NCLASS)
    for img, msk in zip(imgs, masks):
        metric.update_cm(tta(variables, img, msk, quant=32))
    got = metric.class_histogram()

    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_multiscale_matches_and_compile_count(model_and_vars, rng):
    """4 native sizes -> <= 4 compiled bucket programs (here: exactly 3
    with quant=32), CM equal to the per-shape path across scales."""
    model, variables = model_and_vars
    predict_fn = make_predict_fn(model)
    imgs, masks = _data(rng)
    crop = 32
    scales = (0.75, 1.0, 1.25)

    ref = _unbucketed_cm(
        predict_fn, variables, imgs, masks, scales, True, crop
    )

    tta = BucketedTTA(predict_fn, NCLASS, scales=scales, flip=True,
                      crop_size=crop)
    metric = SegmentationMetric(NCLASS)
    for img, msk in zip(imgs, masks):
        metric.update_cm(tta(variables, img, msk, quant=32))
    got = metric.class_histogram()

    buckets = {bucket_for(h, w, 32, crop) for (h, w) in SIZES}
    assert len(tta._programs) == len(buckets) <= 4

    got, ref = np.asarray(got), np.asarray(ref)
    # integer CMs; tolerate isolated argmax flips from f32 accumulation-
    # order differences in the resize matmuls (none observed at bit
    # level on CPU, but this is not a semantics guarantee)
    assert got.sum() == ref.sum()
    diff = np.abs(got - ref).sum()
    assert diff <= max(2, int(2e-4 * ref.sum())), diff


def test_whole_image_mode_runs(model_and_vars, rng):
    """crop_size=None: padded whole-canvas forward (approximate for
    global-ops models, documented) — smoke correctness + shapes."""
    model, variables = model_and_vars
    predict_fn = make_predict_fn(model)
    imgs, masks = _data(rng)
    tta = BucketedTTA(predict_fn, NCLASS, scales=(1.0,), flip=False,
                      crop_size=None)
    cm = tta(variables, imgs[0], masks[0], quant=32)
    cm = np.asarray(cm)
    assert cm.shape == (NCLASS, NCLASS)
    # every non-ignore pixel lands in the CM exactly once
    assert cm.sum() == int((masks[0] >= 0).sum())
