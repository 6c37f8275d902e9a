"""Mixed-precision train/eval steps (TPU.COMPUTE_DTYPE=bfloat16): the
bf16 forward must keep fp32 master params/optimizer state, produce
finite fp32 loss/grads, keep BN running stats fp32, and stay close to
the fp32 step's loss on the same batch."""

import jax
import jax.numpy as jnp
import numpy as np


def _setup(fresh_cfg):
    from segmentron_tpu.engine.steps import TrainState, make_train_step
    from segmentron_tpu.models import get_segmentation_model
    from segmentron_tpu.solver import (
        get_optimizer,
        get_segmentation_loss,
        warmup_poly_lr,
    )
    from segmentron_tpu.utils import batch_sharding, create_mesh, replicate_sharding

    fresh_cfg.MODEL.MODEL_NAME = "FCN"
    fresh_cfg.MODEL.BACKBONE = "resnet18"
    fresh_cfg.DATASET.NAME = "synthetic"
    fresh_cfg.SOLVER.AUX = False
    fresh_cfg.TRAIN.SYNC_BATCH_NORM = True
    model = get_segmentation_model()
    mesh = create_mesh([8], ("data",))
    x = np.random.RandomState(0).randn(8, 32, 32, 3).astype(np.float32)
    y = np.random.RandomState(1).randint(0, 19, (8, 32, 32)).astype(np.int32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    loss_fn = get_segmentation_loss("FCN")
    tx = get_optimizer(fresh_cfg, variables["params"], warmup_poly_lr(0.01, 100))
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        rng=jax.random.PRNGKey(0),
    )
    state = jax.device_put(state, replicate_sharding(mesh))
    xs = jax.device_put(x, batch_sharding(mesh))
    ys = jax.device_put(y, batch_sharding(mesh))
    return model, loss_fn, tx, mesh, state, xs, ys


def test_bf16_step_matches_fp32_and_keeps_master_fp32(fresh_cfg):
    from segmentron_tpu.engine.steps import make_train_step

    model, loss_fn, tx, mesh, state, xs, ys = _setup(fresh_cfg)

    step32 = make_train_step(model, loss_fn, tx, mesh, donate=False)
    step16 = make_train_step(
        model, loss_fn, tx, mesh, donate=False, compute_dtype=jnp.bfloat16
    )
    s32, l32 = step32(state, xs, ys)
    s16, l16 = step16(state, xs, ys)

    l32, l16 = float(l32), float(l16)
    assert np.isfinite(l16)
    # bf16 has ~3 decimal digits; losses should agree loosely
    assert abs(l16 - l32) / max(abs(l32), 1e-6) < 0.05, (l16, l32)

    # master params and BN stats stay fp32 after the bf16 step
    for leaf in jax.tree.leaves(s16.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree.leaves(s16.batch_stats):
        assert leaf.dtype == jnp.float32
