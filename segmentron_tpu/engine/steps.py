"""Compiled train/eval steps over the device mesh.

The TPU replacement for the reference's DDP hot loop (SURVEY.md §3.1):
one jitted ``train_step`` under ``shard_map`` on the ``('data',)`` mesh.
Batch is sharded on the leading axis; params/opt-state are replicated;
gradients (and per-replica BatchNorm statistics, when SyncBN is off)
are ``pmean``-ed over ICI — XLA fuses the collectives with the backward
pass, which is what DDP's bucketed NCCL allreduce approximates by hand.

State buffers are donated, so the step runs in-place in HBM.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.preprocess import maybe_normalize
from ..utils.compileopts import tpu_compiler_options
from ..utils.score import confusion_matrix_update

__all__ = [
    "TrainState",
    "make_train_step",
    "make_eval_step",
    "make_tta_eval_step",
    "make_predict_fn",
]


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array


def _cast_floats(tree, dtype):
    """Cast float leaves to ``dtype`` (ints/bools untouched)."""
    def cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating) and x.dtype != dtype:
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)


def _axis_reduce(reduce_fn, mesh: Mesh, axis: str):
    """``reduce_fn`` bound to ``axis``, elided when the axis has size 1.

    A psum/pmean over a single replica is the identity, but XLA emits
    the collective anyway (measured ~4 ms/step through the BN pmeans on
    the 1-chip train config) — skip it at trace time. The gate reads
    the actual mesh, so multi-device semantics are untouched.
    """
    from ..config import cfg

    if int(mesh.shape[axis]) == 1 and bool(cfg.TPU.ELIDE_COLLECTIVES):
        return lambda x: x
    return functools.partial(reduce_fn, axis_name=axis)


def make_train_step(
    model,
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = "data",
    donate: bool = True,
    compute_dtype=None,
    remat: str = "none",
    augment=None,
):
    """Build the jitted sharded train step: (state, images, masks) ->
    (state, loss).

    With ``augment`` (an ``ops.preprocess.DeviceAugment``), the step
    takes (state, batch_dict) instead — the dict carries raw uint8
    source canvases plus per-sample geometry (data/device_input.py) and
    the random scale/crop/flip/blur/normalize chain runs ON DEVICE
    before the forward (VERDICT r4 #1: the host input path fed 12.7 of
    the 63.9 img/s the step demands). Raw uint8 ``images`` without
    ``augment`` are normalized in-graph (host did the geometry only).

    ``compute_dtype=bfloat16`` enables mixed precision — the TPU
    replacement for the reference's apex.amp: fp32 master params, bf16
    forward/backward (MXU native), fp32 loss/optimizer. BN statistics
    stay fp32 (flax computes stats with float32 promotion).

    ``remat``: activation rematerialization for memory-bound crops
    (HBM <-> FLOPs trade, SURVEY.md build-plan lever):
    - "none": save all activations (fastest, most memory);
    - "dots": save matmul/conv outputs only, recompute elementwise;
    - "full": save only the inputs, recompute the whole forward.
    """
    half = compute_dtype if compute_dtype is not None else jnp.float32
    mixed = half != jnp.float32
    if remat not in ("none", "dots", "full"):
        raise ValueError(f"Unknown remat mode: {remat!r}")
    pmean = _axis_reduce(jax.lax.pmean, mesh, axis)

    def forward(params, batch_stats, images, rng):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )

    if remat == "full":
        forward = jax.checkpoint(forward)
    elif remat == "dots":
        forward = jax.checkpoint(
            forward,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )

    def step_fn(state, *batch_args):
        if augment is not None:
            (batch,) = batch_args
            images, masks = augment.apply(batch)
        else:
            images, masks = batch_args
            images = maybe_normalize(images)
        rng = jax.random.fold_in(state.rng, state.step)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def loss_of(params):
            fwd_params = _cast_floats(params, half) if mixed else params
            outputs, mutated = forward(
                fwd_params,
                state.batch_stats,
                images.astype(half) if mixed else images,
                rng,
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
        grads = pmean(grads)
        loss = pmean(loss)
        # SyncBN already pmeans inside the layer; plain BN stats still must
        # be identical across replicas for the replicated out-spec, so
        # pmean unconditionally (a no-op for SyncBN).
        new_stats = pmean(mutated["batch_stats"])
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt_state,
                rng=state.rng,
            ),
            loss,
        )

    in_specs = (P(), P(axis)) if augment is not None else (P(), P(axis), P(axis))
    sharded = jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P()),
        check_vma=False,
    )
    jitted = jax.jit(sharded, donate_argnums=(0,) if donate else (),
                     compiler_options=tpu_compiler_options())
    # raw per-shard body for callers that build their own program
    # around it (bench.py's in-jit training loop — the relay's ~10 ms
    # dispatch latency would otherwise pollute per-step timing)
    jitted.raw = step_fn
    return jitted


def make_eval_step(
    model, nclass: int, mesh: Mesh, axis: str = "data", compute_dtype=None
):
    """Sharded eval step: (params, batch_stats, images, masks) ->
    psum'd confusion matrix (nclass, nclass)."""
    half = compute_dtype if compute_dtype is not None else jnp.float32
    mixed = half != jnp.float32

    def step_fn(params, batch_stats, images, masks):
        images = maybe_normalize(images)
        if mixed:
            params = _cast_floats(params, half)
            images = images.astype(half)
        outputs = model.apply(
            {"params": params, "batch_stats": batch_stats}, images, False
        )
        pred = jnp.argmax(outputs[0], axis=-1)
        cm = confusion_matrix_update(pred, masks, nclass)
        return _axis_reduce(jax.lax.psum, mesh, axis)(cm)

    sharded = jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded, compiler_options=tpu_compiler_options())


def make_tta_eval_step(
    model,
    nclass: int,
    mesh: Mesh,
    scales=(1.0,),
    flip: bool = False,
    crop_size: Optional[int] = None,
    axis: str = "data",
    compute_dtype=None,
):
    """Sharded full-TTA eval step (SURVEY §3.2 metric reduction): images
    round-robin over the ``data`` axis, each shard runs the COMPLETE
    multi-scale + flip + sliding-window pipeline on its images, and the
    per-shard confusion matrices are psum'd — one compiled program per
    image-shape bucket, shard-count-invariant results (the CM sum is
    integer, so 8-device == 1-device bit for bit).

    (variables, images (N,H,W,3), masks (N,H,W)) -> cm (nclass, nclass),
    N a multiple of mesh size; callers pad ragged tails with all-ignore
    masks (zero CM contribution).
    """
    from .tta import _multi_scale_body

    half = compute_dtype if compute_dtype is not None else jnp.float32
    mixed = half != jnp.float32

    def predict(variables, images):
        if mixed:
            variables = dict(variables)
            variables["params"] = _cast_floats(variables["params"], half)
            images = images.astype(half)
        return model.apply(variables, images, False)[0].astype(jnp.float32)

    def step_fn(variables, images, masks):
        # raw-uint8 loader mode: normalize BEFORE the TTA scale resizes,
        # exactly where the host pipeline normalized
        images = maybe_normalize(images)
        probs = _multi_scale_body(
            predict, variables, images, nclass, list(scales), bool(flip),
            int(crop_size) if crop_size else None, True,
        )
        pred = jnp.argmax(probs, axis=-1)
        cm = confusion_matrix_update(pred, masks, nclass)
        return _axis_reduce(jax.lax.psum, mesh, axis)(cm)

    sharded = jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded, compiler_options=tpu_compiler_options())


def make_predict_fn(model, compute_dtype=None):
    """Single-device jitted logits fn: (variables, images) -> main logits.

    Logits are returned in fp32 regardless of compute dtype (TTA sums
    and argmax-margin comparisons need the precision)."""
    half = compute_dtype if compute_dtype is not None else jnp.float32
    mixed = half != jnp.float32

    def predict_body(variables, images):
        images = maybe_normalize(images)
        if mixed:
            variables = dict(variables)
            variables["params"] = _cast_floats(variables["params"], half)
            images = images.astype(half)
        return model.apply(variables, images, False)[0].astype(jnp.float32)

    predict = jax.jit(predict_body, compiler_options=tpu_compiler_options())
    # ``compiler_options`` is only legal on a TOP-LEVEL jit: callers
    # that nest this predictor inside their own jitted program (TTA,
    # bucketed eval) must unwrap to the raw traceable body.
    predict.raw = predict_body
    return predict
