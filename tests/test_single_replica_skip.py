"""Single-replica collective elision.

A pmean/psum over a size-1 mesh axis is the identity, but XLA still
emits the collective (measured ~4 ms/step through the SyncBN pmeans on
the 1-chip train config — BASELINE.md train-step roofline). The gates:

- ``engine/steps.py::_axis_reduce`` drops grad/loss/stats/CM reductions
  at trace time when ``mesh.shape[axis] == 1``;
- ``modules/batch_norm.py::norm_from_cfg`` downgrades SyncBN -> BN when
  the config resolves to a size-1 data axis (bit-exact: flax computes
  batch var identically either way, and stack/pmean/unstack is a value
  no-op at size 1).

Multi-device equivalence is separately pinned by test_dp_equivalence
(whose 1-device arm now runs the elided path).
"""

import jax
import jax.numpy as jnp
import numpy as np


def _tiny_unet(fresh_cfg):
    from segmentron_tpu.models import get_segmentation_model

    fresh_cfg.MODEL.MODEL_NAME = "UNet"
    fresh_cfg.MODEL.BACKBONE = ""
    fresh_cfg.DATASET.NAME = "synthetic"
    fresh_cfg.SOLVER.AUX = False
    fresh_cfg.TRAIN.SYNC_BATCH_NORM = True
    return get_segmentation_model()


def test_data_axis_size_resolution(fresh_cfg):
    from segmentron_tpu.utils.distributed import data_axis_size

    assert data_axis_size(fresh_cfg) == jax.device_count()  # default mesh
    fresh_cfg.TPU.MESH_SHAPE = [1]
    assert data_axis_size(fresh_cfg) == 1
    fresh_cfg.TPU.MESH_SHAPE = [2, 4]
    fresh_cfg.TPU.MESH_AXES = ["data", "model"]
    assert data_axis_size(fresh_cfg) == 2
    # axis not materialized by a short explicit shape -> default count
    fresh_cfg.TPU.MESH_SHAPE = [4]
    fresh_cfg.TPU.MESH_AXES = ["model"]
    assert data_axis_size(fresh_cfg) == jax.device_count()


def test_syncbn_downgrades_on_single_replica(fresh_cfg):
    from segmentron_tpu.modules.batch_norm import norm_from_cfg

    fresh_cfg.MODEL.BN_TYPE = "BN"
    fresh_cfg.TRAIN.SYNC_BATCH_NORM = True
    assert norm_from_cfg(fresh_cfg).bn_type == "SyncBN"  # 8 test devices
    fresh_cfg.TPU.MESH_SHAPE = [1]
    assert norm_from_cfg(fresh_cfg).bn_type == "BN"


def test_single_device_step_emits_no_collectives(fresh_cfg):
    """Compiled HLO of the 1-device train step must contain no
    all-reduce; the 8-device step must contain one."""
    from segmentron_tpu.engine.steps import TrainState, make_train_step
    from segmentron_tpu.solver import (
        get_optimizer,
        get_segmentation_loss,
        warmup_poly_lr,
    )
    from segmentron_tpu.utils import create_mesh

    x = np.zeros((8, 32, 32, 3), np.float32)
    y = np.zeros((8, 32, 32), np.int32)
    loss_fn = get_segmentation_loss("UNet")

    def hlo(n_dev):
        # model must be built under the same mesh config it runs on —
        # the SyncBN downgrade happens at construction time
        fresh_cfg.TPU.MESH_SHAPE = [n_dev]
        model = _tiny_unet(fresh_cfg)
        variables = model.init(jax.random.PRNGKey(0), x[:1])
        tx = get_optimizer(fresh_cfg, variables["params"], warmup_poly_lr(0.1, 10))
        mesh = create_mesh([n_dev], ("data",), devices=jax.devices()[:n_dev])
        state = TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            rng=jax.random.PRNGKey(0),
        )
        step = make_train_step(model, loss_fn, tx, mesh, donate=False)
        return step.lower(state, x, y).compile().as_text()

    assert "all-reduce" not in hlo(1)
    assert "all-reduce" in hlo(8)


def test_downgraded_bn_matches_syncbn_values(fresh_cfg):
    """Same params, same batch: the downgraded (plain-BN) model applied
    directly must match the SyncBN model applied under a 1-device
    shard_map — outputs and updated running stats bit-close."""
    from jax.sharding import PartitionSpec as P

    from segmentron_tpu.models import get_segmentation_model
    from segmentron_tpu.utils import create_mesh

    fresh_cfg.MODEL.MODEL_NAME = "UNet"
    fresh_cfg.MODEL.BACKBONE = ""
    fresh_cfg.DATASET.NAME = "synthetic"
    fresh_cfg.SOLVER.AUX = False
    fresh_cfg.TRAIN.SYNC_BATCH_NORM = True
    sync_model = get_segmentation_model()

    fresh_cfg.TPU.MESH_SHAPE = [1]
    plain_model = get_segmentation_model()  # norm_from_cfg downgrades

    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
    variables = plain_model.init(jax.random.PRNGKey(0), x)

    out_plain, mut_plain = plain_model.apply(
        variables, x, True, mutable=["batch_stats"]
    )

    mesh = create_mesh([1], ("data",), devices=jax.devices()[:1])
    apply_sync = jax.shard_map(
        lambda v, xx: sync_model.apply(v, xx, True, mutable=["batch_stats"]),
        mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=(P("data"), P()),
        check_vma=False,
    )
    out_sync, mut_sync = apply_sync(variables, x)

    np.testing.assert_allclose(
        np.asarray(out_plain[0]), np.asarray(out_sync[0]), rtol=1e-6, atol=1e-6
    )
    for a, b in zip(
        jax.tree.leaves(mut_plain["batch_stats"]),
        jax.tree.leaves(mut_sync["batch_stats"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
