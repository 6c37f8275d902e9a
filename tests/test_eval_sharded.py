"""Sharded Evaluator (VERDICT r1 item 3 — SURVEY §3.2 metric reduction):
the full multi-scale + flip + sliding-window TTA pipeline data-parallel
over the 8-device mesh must produce a confusion matrix BIT-IDENTICAL to
the single-device path (the CM sum is integer, so sharding cannot change
it), including non-square Cityscapes-aspect shapes and ragged tails.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _tiny_model(fresh_cfg):
    from segmentron_tpu.models import get_segmentation_model

    fresh_cfg.MODEL.MODEL_NAME = "UNet"
    fresh_cfg.MODEL.BACKBONE = ""
    fresh_cfg.DATASET.NAME = "synthetic"
    fresh_cfg.SOLVER.AUX = False
    fresh_cfg.TRAIN.SYNC_BATCH_NORM = False
    model = get_segmentation_model()
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 16, 16, 3), np.float32)
    )
    return model, variables


def test_sharded_tta_eval_matches_single_device(fresh_cfg):
    """8-device sharded TTA (multi-scale + flip + sliding windows on
    NON-SQUARE 33x47 images) == single-device TTA, bit for bit."""
    from segmentron_tpu.engine.steps import make_predict_fn, make_tta_eval_step
    from segmentron_tpu.engine.tta import multi_scale_predict
    from segmentron_tpu.utils import create_mesh
    from segmentron_tpu.utils.distributed import batch_sharding
    from segmentron_tpu.utils.score import confusion_matrix_update

    model, variables = _tiny_model(fresh_cfg)
    nclass = 19
    rng = np.random.RandomState(0)
    images = rng.randn(8, 33, 47, 3).astype(np.float32)
    masks = rng.randint(-1, nclass, (8, 33, 47)).astype(np.int32)
    scales, flip, crop = (0.75, 1.0), True, 16

    # single-device reference
    predict = make_predict_fn(model)
    cm_ref = np.zeros((nclass, nclass), np.int64)
    for i in range(8):
        probs = multi_scale_predict(
            predict, variables, jnp.asarray(images[i : i + 1]), nclass,
            scales=scales, flip=flip, crop_size=crop,
        )
        cm_ref += np.asarray(
            confusion_matrix_update(
                jnp.argmax(probs, -1), jnp.asarray(masks[i : i + 1]), nclass
            ),
            np.int64,
        )

    mesh = create_mesh([8], ("data",))
    step = make_tta_eval_step(model, nclass, mesh, scales=scales, flip=flip,
                              crop_size=crop)
    cm = step(
        variables,
        jax.device_put(images, batch_sharding(mesh)),
        jax.device_put(masks, batch_sharding(mesh)),
    )
    np.testing.assert_array_equal(np.asarray(cm, np.int64), cm_ref)


def test_evaluator_distributed_matches_single(fresh_cfg, monkeypatch):
    """Evaluator end-to-end: TEST.DISTRIBUTED over 8 devices (with a
    ragged 5-image tail padded by all-ignore masks) == single-device
    Evaluator, identical confusion matrix and mIoU."""
    from segmentron_tpu.engine.evaluator import Evaluator

    fresh_cfg.MODEL.MODEL_NAME = "UNet"
    fresh_cfg.MODEL.BACKBONE = ""
    fresh_cfg.DATASET.NAME = "synthetic"
    fresh_cfg.DATASET.MODE = "testval"
    fresh_cfg.SOLVER.AUX = False
    fresh_cfg.TRAIN.SYNC_BATCH_NORM = False
    fresh_cfg.TEST.SCALES = [1.0]
    fresh_cfg.TEST.FLIP = True
    fresh_cfg.TEST.CROP_SIZE = 16
    fresh_cfg.TEST.TEST_MODEL_PATH = ""

    def build(distributed):
        fresh_cfg.TEST.DISTRIBUTED = distributed
        ev = Evaluator(args=None)
        ev.dataset.length = 5  # ragged vs the 8-device mesh
        ev.dataset.image_size = (24, 40)
        return ev

    ev_d = build(True)
    assert ev_d.mesh is not None and ev_d.mesh.size == 8
    # reuse the same random variables in both runs
    variables = ev_d.variables
    ev_d.eval()
    cm_d = ev_d.metric.confusion_matrix

    ev_s = build(False)
    assert ev_s.mesh is None
    ev_s.variables = variables
    ev_s.eval()
    cm_s = ev_s.metric.confusion_matrix

    assert cm_d.sum() == cm_s.sum() > 0
    np.testing.assert_array_equal(cm_d, cm_s)


@pytest.mark.parametrize("model_name", ["OCNet", "DANet"])
def test_attention_model_sharded_eval_and_spatial(fresh_cfg, model_name):
    """VERDICT r2 weak #6: the attention models that MOTIVATE spatial
    sharding (SURVEY §2.9 SP row) must themselves run under multi-device
    meshes — data-sharded eval (psum CM == single-device CM) and a
    height-sharded forward through the (HW x HW) attention head."""
    from segmentron_tpu.engine.steps import make_eval_step
    from segmentron_tpu.models import get_segmentation_model
    from segmentron_tpu.parallel import make_spatial_predict_fn
    from segmentron_tpu.utils import create_mesh
    from segmentron_tpu.utils.distributed import batch_sharding
    from segmentron_tpu.utils.score import confusion_matrix_update

    fresh_cfg.MODEL.MODEL_NAME = model_name
    fresh_cfg.MODEL.BACKBONE = "resnet18"
    fresh_cfg.MODEL.OUTPUT_STRIDE = 8
    fresh_cfg.MODEL.OCNet.OC_ARCH = "base"
    fresh_cfg.DATASET.NAME = "synthetic"
    fresh_cfg.SOLVER.AUX = False
    fresh_cfg.TRAIN.SYNC_BATCH_NORM = False
    model = get_segmentation_model()
    nclass = 19
    rng = np.random.RandomState(0)
    images = rng.randn(8, 32, 32, 3).astype(np.float32)
    masks = rng.randint(-1, nclass, (8, 32, 32)).astype(np.int32)
    variables = model.init(jax.random.PRNGKey(0), images[:1])

    # single-device CM reference
    logits = model.apply(variables, jnp.asarray(images), False)[0]
    cm_ref = np.asarray(
        confusion_matrix_update(
            jnp.argmax(logits, -1), jnp.asarray(masks), nclass
        )
    )

    mesh = create_mesh([8], ("data",))
    step = make_eval_step(model, nclass, mesh)
    cm = step(
        variables["params"], variables.get("batch_stats", {}),
        jax.device_put(images, batch_sharding(mesh)),
        jax.device_put(masks, batch_sharding(mesh)),
    )
    np.testing.assert_array_equal(np.asarray(cm), cm_ref)

    # spatial (height-sharded) forward: logits equal the replicated ones
    mesh2 = create_mesh([4, 2], ("data", "model"))
    predict = make_spatial_predict_fn(model, mesh2, axis="model")
    sp = predict(variables, images[:1])
    np.testing.assert_allclose(
        np.asarray(sp), np.asarray(logits[:1]), rtol=1e-4, atol=1e-4
    )


def test_sliding_stitch_exact_on_odd_shapes(fresh_cfg):
    """Stitching correctness oracle (VERDICT r1 weakness 7): with a
    receptive-field-1 model (1x1 'classifier'), sliding-window logits
    stitched over a 97x193 Cityscapes-aspect image must equal the
    whole-image forward exactly — any window/canvas off-by-one breaks
    equality."""
    import flax.linen as nn
    from segmentron_tpu.engine.tta import predict_sliding

    class OneByOne(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            return nn.Conv(6, (1, 1), use_bias=True)(x)

    model = OneByOne()
    x = np.random.RandomState(0).randn(1, 97, 193, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    def predict(v, im):
        return model.apply(v, im)

    whole = np.asarray(predict(variables, jnp.asarray(x)))
    stitched = np.asarray(
        predict_sliding(predict, variables, jnp.asarray(x), crop_size=64,
                        nclass=6)
    )
    np.testing.assert_allclose(stitched, whole, rtol=1e-5, atol=1e-5)
