"""Data-parallel equivalence (SURVEY.md §4 strategy #3): one train step
on the 8-device mesh (grads pmean'd across shards) must equal the same
step on a 1-device mesh with the identical batch — when every pixel is
valid, mean-of-shard-means == global mean, which is also exactly the
reference's DDP loss semantics."""

import jax
import jax.numpy as jnp
import numpy as np


def test_dp_step_equals_single_device(fresh_cfg):
    from segmentron_tpu.engine.steps import TrainState, make_train_step
    from segmentron_tpu.models import get_segmentation_model
    from segmentron_tpu.solver import (
        get_optimizer,
        get_segmentation_loss,
        warmup_poly_lr,
    )
    from segmentron_tpu.utils import batch_sharding, create_mesh, replicate_sharding

    # UNet: dropout-free, so per-shard dropout RNG folding cannot
    # break exact equivalence
    fresh_cfg.MODEL.MODEL_NAME = "UNet"
    fresh_cfg.MODEL.BACKBONE = ""
    fresh_cfg.DATASET.NAME = "synthetic"
    fresh_cfg.SOLVER.AUX = False
    fresh_cfg.TRAIN.SYNC_BATCH_NORM = True  # exercise psum-BN too
    model = get_segmentation_model()

    x = np.random.RandomState(0).randn(8, 32, 32, 3).astype(np.float32)
    y = np.random.RandomState(1).randint(0, 19, (8, 32, 32)).astype(np.int32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    loss_fn = get_segmentation_loss("UNet")

    def run(n_dev):
        tx = get_optimizer(fresh_cfg, variables["params"], warmup_poly_lr(0.1, 10))
        mesh = create_mesh([n_dev], ("data",), devices=jax.devices()[:n_dev])
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
        step = make_train_step(model, loss_fn, tx, mesh, donate=False)
        new_state, loss = step(state, xs, ys)
        return jax.device_get(new_state), float(loss)

    s8, l8 = run(8)
    s1, l1 = run(1)

    assert abs(l8 - l1) < 1e-5, (l8, l1)
    _check_params_and_stats(s8, s1)


def _check_params_and_stats(s8, s1):
    # accumulation order differs between the sharded pmean and the
    # single-device reduction; allow float-noise on near-zero params
    for a, b in zip(jax.tree.leaves(s8.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)
    # SyncBN statistics must also agree (psum-BN == big-batch BN)
    for a, b in zip(jax.tree.leaves(s8.batch_stats), jax.tree.leaves(s1.batch_stats)):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_ohem_dp_is_per_shard(fresh_cfg):
    """Pins the documented OHEM DP semantics (solver/loss.py): under the
    8-device mesh the mined loss equals the MEAN OF PER-SHARD OHEM
    losses (= reference DDP, where each rank mines its local batch),
    which generally differs from single-device mining over the full
    batch."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from segmentron_tpu.solver.loss import ohem_ce_loss
    from segmentron_tpu.utils import create_mesh

    rng = np.random.RandomState(0)
    n, h, w, c = 8, 8, 8, 4
    logits = rng.randn(n, h, w, c).astype(np.float32)
    target = rng.randint(-1, c, size=(n, h, w)).astype(np.int32)
    kw = dict(thresh=0.7, min_kept=5)  # min_kept binds per shard

    mesh = create_mesh([8], ("data",))
    sharded = jax.jit(
        jax.shard_map(
            lambda lg, tg: jax.lax.pmean(
                ohem_ce_loss((lg,), tg, **kw), "data"
            ),
            mesh=mesh,
            in_specs=(P("data"), P("data")),
            out_specs=P(),
            check_vma=False,
        )
    )
    got = float(sharded(jnp.asarray(logits), jnp.asarray(target)))
    want = np.mean([
        float(ohem_ce_loss((jnp.asarray(logits[i : i + 1]),),
                           jnp.asarray(target[i : i + 1]), **kw))
        for i in range(n)
    ])
    assert np.isclose(got, want, rtol=1e-5), (got, want)
    # and it intentionally differs from global (single-device) mining
    global_loss = float(
        ohem_ce_loss((jnp.asarray(logits),), jnp.asarray(target), **kw)
    )
    assert not np.isclose(got, global_loss, rtol=1e-3), (got, global_loss)
