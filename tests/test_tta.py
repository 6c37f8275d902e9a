"""TTA engine unit tests: sliding-window stitching must reduce to the
whole-image forward when one window covers the image, and the
multi-scale accumulator must be flip-consistent for a flip-equivariant
predictor."""

import jax.numpy as jnp
import numpy as np

from segmentron_tpu.engine.tta import (
    multi_scale_predict,
    predict_sliding,
    predict_whole,
)

NCLASS = 7


def _linear_predictor(variables, images):
    """A deterministic, flip-equivariant 'model': per-pixel linear map of
    the 3 input channels to NCLASS logits (no spatial mixing)."""
    w = jnp.arange(3 * NCLASS, dtype=jnp.float32).reshape(3, NCLASS) / 10.0
    return images @ w


def test_sliding_equals_whole_when_window_covers():
    img = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3), jnp.float32)
    whole = predict_whole(_linear_predictor, None, img)
    slid = predict_sliding(_linear_predictor, None, img, crop_size=32,
                           nclass=NCLASS)
    np.testing.assert_allclose(np.asarray(slid), np.asarray(whole), rtol=1e-6)


def test_sliding_stitching_matches_whole_for_pointwise_model():
    # overlapping windows of a pointwise model must stitch back exactly
    img = jnp.asarray(np.random.RandomState(1).rand(1, 48, 40, 3), jnp.float32)
    whole = predict_whole(_linear_predictor, None, img)
    slid = predict_sliding(_linear_predictor, None, img, crop_size=32,
                           nclass=NCLASS)
    np.testing.assert_allclose(np.asarray(slid), np.asarray(whole),
                               rtol=1e-5, atol=1e-6)


def test_multi_scale_flip_consistency():
    img = jnp.asarray(np.random.RandomState(2).rand(1, 32, 32, 3), jnp.float32)
    probs = multi_scale_predict(
        _linear_predictor, None, img, NCLASS, scales=(1.0,), flip=True
    )
    # pointwise predictor is exactly flip-equivariant, so flipped and
    # unflipped passes contribute identically: total = 2 * softmax(logits)
    one = multi_scale_predict(
        _linear_predictor, None, img, NCLASS, scales=(1.0,), flip=False
    )
    np.testing.assert_allclose(np.asarray(probs), 2 * np.asarray(one),
                               rtol=1e-5)


def test_multi_scale_returns_source_resolution():
    img = jnp.asarray(np.random.RandomState(3).rand(1, 30, 42, 3), jnp.float32)
    probs = multi_scale_predict(
        _linear_predictor, None, img, NCLASS, scales=(0.5, 1.0, 1.5),
        flip=False,
    )
    assert probs.shape == (1, 30, 42, NCLASS)
