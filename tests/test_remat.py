"""Rematerialization modes must not change training numerics: the step
with remat='dots'/'full' produces the same loss and updated params as
remat='none' (only memory/FLOPs differ)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.parametrize("mode", ["dots", "full"])
def test_remat_step_matches_plain(fresh_cfg, mode):
    from segmentron_tpu.engine.steps import TrainState, make_train_step
    from segmentron_tpu.models import get_segmentation_model
    from segmentron_tpu.solver import (
        get_optimizer,
        get_segmentation_loss,
        warmup_poly_lr,
    )
    from segmentron_tpu.utils import batch_sharding, create_mesh, replicate_sharding

    fresh_cfg.MODEL.MODEL_NAME = "UNet"  # dropout-free: rng replay-safe
    fresh_cfg.MODEL.BACKBONE = ""
    fresh_cfg.DATASET.NAME = "synthetic"
    fresh_cfg.TRAIN.SYNC_BATCH_NORM = True
    model = get_segmentation_model()

    x = np.random.RandomState(0).randn(8, 32, 32, 3).astype(np.float32)
    y = np.random.RandomState(1).randint(0, 19, (8, 32, 32)).astype(np.int32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    loss_fn = get_segmentation_loss("UNet")
    mesh = create_mesh([8], ("data",))

    def run(remat):
        tx = get_optimizer(fresh_cfg, variables["params"], warmup_poly_lr(0.1, 10))
        state = TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            rng=jax.random.PRNGKey(0),
        )
        state = jax.device_put(state, replicate_sharding(mesh))
        step = make_train_step(model, loss_fn, tx, mesh, donate=False,
                               remat=remat)
        new_state, loss = step(
            state,
            jax.device_put(x, batch_sharding(mesh)),
            jax.device_put(y, batch_sharding(mesh)),
        )
        return jax.device_get(new_state), float(loss)

    s0, l0 = run("none")
    s1, l1 = run(mode)
    assert abs(l0 - l1) < 1e-6, (l0, l1)
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
