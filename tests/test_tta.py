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


def test_options_jitted_predictor_nests_in_tta(monkeypatch):
    """A make_predict_fn predictor carries compiler_options on its own
    jit (scoped-VMEM for the fused entry chain); nesting it inside the
    outer TTA jit must NOT trip JAX's "compiler_options can only be
    passed to top-level jax.jit" check — TTA unwraps to the raw body
    via the .raw attribute. Regression: tools/eval.py crashed under
    TPU.FUSED_STEM="block1" (r3)."""
    import flax.linen as nn
    import jax

    from segmentron_tpu.engine import steps as steps_mod
    from segmentron_tpu.engine.bucketed import BucketedTTA
    from segmentron_tpu.engine.steps import make_predict_fn

    # force options onto the predictor jit even on the CPU test backend
    monkeypatch.setattr(
        steps_mod,
        "tpu_compiler_options",
        lambda: {"xla_backend_optimization_level": "1"},
    )

    class Pointwise(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return (nn.Dense(NCLASS)(x),)

    model = Pointwise()
    img = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    predict = make_predict_fn(model)
    assert hasattr(predict, "raw")

    direct = predict(variables, img)  # top-level use keeps the options
    probs = multi_scale_predict(
        predict, variables, img, NCLASS, scales=(1.0, 0.5), flip=True
    )
    assert probs.shape == (1, 32, 32, NCLASS)

    cm = BucketedTTA(predict, NCLASS, scales=(1.0,), crop_size=None)(
        variables,
        np.asarray(img[0], np.float32),
        np.zeros((32, 32), np.int32),
        quant=32,
    )
    assert cm.shape == (NCLASS, NCLASS)
    assert int(np.asarray(cm).sum()) == 32 * 32
    np.testing.assert_allclose(
        np.asarray(direct),
        np.asarray(predict.raw(variables, img)),
        rtol=1e-5,
        atol=1e-6,
    )
