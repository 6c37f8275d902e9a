"""Zoo-wide train-step smoke: every registered model runs a TRAIN-mode
forward with its model-matched loss and a full backward, and produces a
finite loss with finite, non-trivial gradients.

The reference's only quality control for training was "the training
run works" (SURVEY.md §4); forward shapes alone (test_models.py) would
miss broken train-mode branches (BN stat mutation, dropout rngs, loss
dispatch, custom VJPs) — this pins all of them per model on tiny
inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmentron_tpu.models import get_segmentation_model

from test_models import CASES


@pytest.mark.parametrize(
    "name,backbone,overrides,n_out",
    CASES,
    ids=[f"{c[0]}-{c[1] or 'nobb'}-{i}" for i, c in enumerate(CASES)],
)
def test_train_step_smoke(fresh_cfg, name, backbone, overrides, n_out):
    from segmentron_tpu.solver import get_segmentation_loss

    fresh_cfg.MODEL.MODEL_NAME = name
    fresh_cfg.MODEL.BACKBONE = backbone
    fresh_cfg.DATASET.NAME = "synthetic"
    fresh_cfg.SOLVER.AUX = True
    fresh_cfg.TRAIN.SYNC_BATCH_NORM = False
    fresh_cfg.TPU.USE_PALLAS = False
    for k, v in overrides.items():
        node = fresh_cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    model = get_segmentation_model()
    loss_fn = get_segmentation_loss(name, aux=True)

    rng = np.random.RandomState(42)
    x = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    target = jnp.asarray(rng.randint(0, 19, (1, 64, 64)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x)
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}

    def loss_of(p):
        outs = model.apply(
            {"params": p, **extra},
            x,
            True,
            mutable=[k for k in extra],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        outs, _ = outs if isinstance(outs, tuple) else (outs, None)
        return loss_fn(outs, target)

    loss, grads = jax.value_and_grad(loss_of)(params)
    assert np.isfinite(float(loss)), (name, float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves
    finite = [bool(np.all(np.isfinite(np.asarray(g)))) for g in leaves]
    assert all(finite), (name, "non-finite grads")
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total > 0.0, (name, "all-zero gradient")
