"""Spatial partitioning for full-resolution inference AND training.

The (H, W) activation plane of a 1024x2048 Cityscapes image at OS8 with
an attention head can exceed one chip's HBM. The reference's answer is
crop-based sliding windows; the TPU-native answer is to *shard the
image height across chips* and let GSPMD insert the conv halo
exchanges: annotate the input as ``P(None, 'model', None, None)``
(NHWC), jit, done. Collectives ride ICI; no manual stitching.

This is the vision analogue of sequence parallelism (SURVEY.md §5.7).

``make_spatial_train_step`` (VERDICT r4 #8) is the training form: the
same GSPMD height sharding through forward AND backward (XLA derives
the transposed halo exchanges for dx and the partial-sum reductions for
dW on its own), optionally hybrid with batch sharding on a 2-D
(data x model) mesh. It exists for crops whose activations OOM one
chip — 1024² batch 8 currently needs remat="dots" at a measured 2.3x
step-time cost (27.3 vs 63.9 img/s, BASELINE.md); height sharding
splits the activations instead of recomputing them. One honest caveat:
this container has ONE physical chip, so only the 8-virtual-device CPU
grad-equivalence test and the dryrun exercise it — the chip-level win
cannot be demonstrated here.

Semantics note: the step uses FULL-ARRAY (GSPMD) semantics — plain
BatchNorm statistics are computed over the global batch automatically,
which is exactly what SyncBN approximates; build the model with
``TRAIN.SYNC_BATCH_NORM=False`` (a per-shard ``axis_name`` has no
meaning under jit-partitioning).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "spatial_sharding",
    "make_spatial_predict_fn",
    "make_spatial_train_step",
]


def spatial_sharding(
    mesh: Mesh, axis: str = "model", batch_axis: str | None = None
) -> NamedSharding:
    """NHWC images sharded along H over ``axis``; optionally the batch
    over ``batch_axis`` too (2-D hybrid: dp x spatial on one mesh)."""
    return NamedSharding(mesh, P(batch_axis, axis, None, None))


def make_spatial_predict_fn(
    model, mesh: Mesh, axis: str = "model", batch_axis: str | None = None
):
    """Jitted logits fn with the input height GSPMD-sharded over ``axis``.

    Params are replicated; the output logits come back with the same
    spatial sharding (argmax/metrics can stay distributed). With
    ``batch_axis`` set, images shard over BOTH mesh axes — batch over
    ``batch_axis``, height over ``axis`` — so a (B, H, W, C) eval batch
    on a (dp, sp) mesh keeps every chip busy while each image's
    activation plane still fits: the dp analogue of DP + sequence
    parallelism composed on one mesh (SURVEY.md §5.7).
    """
    img_sharding = spatial_sharding(mesh, axis, batch_axis)
    rep = NamedSharding(mesh, P())

    @jax.jit
    def predict(variables, images):
        from ..ops.preprocess import maybe_normalize

        images = maybe_normalize(images)  # raw-uint8 loader mode
        images = jax.lax.with_sharding_constraint(images, img_sharding)
        return model.apply(variables, images, False)[0]

    def run(variables, images):
        variables = jax.device_put(variables, rep)
        images = jax.device_put(images, img_sharding)
        return predict(variables, images)

    return run


def make_spatial_train_step(
    model,
    loss_fn,
    tx,
    mesh: Mesh,
    axis: str = "model",
    batch_axis: Optional[str] = None,
    compute_dtype=None,
    donate: bool = True,
):
    """Height-sharded train step: (state, images, masks) -> (state, loss).

    Unlike ``make_train_step`` (shard_map over per-replica bodies with
    explicit pmeans), this is a plain jit over FULL arrays with GSPMD
    sharding constraints: images/masks height-sharded over ``axis``
    (optionally batch-sharded over ``batch_axis``), params/opt-state
    replicated. XLA partitions the whole fwd+bwd+update — conv halo
    exchanges in both directions, dW partial-sum psums, global-batch BN
    statistics — so the result is numerically the SINGLE-DEVICE step
    (same math, different reduction orders), pinned by
    tests/test_spatial_train.py.
    """
    from ..engine.steps import TrainState, _cast_floats  # noqa: F401
    from ..ops.preprocess import maybe_normalize
    from ..utils.compileopts import tpu_compiler_options

    half = compute_dtype if compute_dtype is not None else jnp.float32
    mixed = half != jnp.float32
    img_sharding = spatial_sharding(mesh, axis, batch_axis)
    mask_sharding = NamedSharding(mesh, P(batch_axis, axis, None))
    rep = NamedSharding(mesh, P())

    def step_fn(state, images, masks):
        images = maybe_normalize(images)
        images = jax.lax.with_sharding_constraint(images, img_sharding)
        rng = jax.random.fold_in(state.rng, state.step)

        def loss_of(params):
            fwd_params = _cast_floats(params, half) if mixed else params
            outputs, mutated = model.apply(
                {"params": fwd_params, "batch_stats": state.batch_stats},
                images.astype(half) if mixed else images,
                True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            return loss_fn(outputs, masks), mutated

        (loss, mutated), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state.params
        )
        if mixed:
            grads = _cast_floats(grads, jnp.float32)
            mutated = {"batch_stats": _cast_floats(
                mutated["batch_stats"], jnp.float32
            )}
        import optax

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                batch_stats=mutated["batch_stats"],
                opt_state=new_opt_state,
                rng=state.rng,
            ),
            loss,
        )

    return jax.jit(
        step_fn,
        in_shardings=(rep, img_sharding, mask_sharding),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate else (),
        compiler_options=tpu_compiler_options(),
    )
