"""Device-mesh helpers — the TPU replacement for the reference's
``segmentron/utils/distributed.py`` (torch.distributed/NCCL glue).

There is no hand-written communication layer: data parallelism is a
batch-sharded ``jax.jit`` / ``shard_map`` over a named ``Mesh`` whose
collectives XLA lowers onto ICI. These helpers build the mesh, shard host
batches onto it, and expose rank-style predicates for logging parity.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = [
    "get_world_size",
    "get_rank",
    "is_main_process",
    "synchronize",
    "create_mesh",
    "batch_sharding",
    "replicate_sharding",
    "shard_batch",
    "make_data_sampler",
    "data_axis_size",
]


def data_axis_size(cfg=None, axis: str = "data") -> int:
    """Size the ``data`` mesh axis WOULD have under the current config.

    Mirrors ``create_mesh``'s resolution rule: an explicit
    ``cfg.TPU.MESH_SHAPE`` pins it; otherwise the default 1-D mesh puts
    every device on the data axis. Used by trace-time gates that elide
    single-replica collectives (SyncBN -> BN downgrade): a ``pmean``
    over a size-1 axis is the identity, but XLA still emits the
    collective (~4 ms/step measured on the train config, v5e 1 chip).
    Only consult this where the model is guaranteed to run under a mesh
    built from the same config.
    """
    if cfg is None:
        from ..config import cfg as _cfg

        cfg = _cfg
    shape = list(cfg.TPU.MESH_SHAPE or [])
    axes = tuple(cfg.TPU.MESH_AXES)
    if shape and axis in axes[: len(shape)]:
        return int(shape[list(axes).index(axis)])
    try:
        return jax.device_count()
    except RuntimeError:
        # backend not up (relay outage during model construction):
        # report >1 so the caller keeps the multi-replica collectives —
        # always-correct semantics, just without the size-1 elision
        return 2


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def synchronize() -> None:
    """Barrier across processes (reference: dist.barrier())."""
    if jax.process_count() == 1:
        return
    # A tiny psum across all devices acts as a barrier.
    x = jnp.ones((jax.local_device_count(),))
    jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x).block_until_ready()


def create_mesh(
    mesh_shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a named device mesh.

    Default: a 1-D ``('data',)`` mesh over all devices — the TPU analogue
    of the reference's one-process-per-GPU DDP world.
    """
    devices = list(devices if devices is not None else jax.devices())
    if not mesh_shape:
        mesh_shape = [len(devices)]
        axis_names = tuple(axis_names[:1])
    arr = np.asarray(devices).reshape(tuple(mesh_shape))
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``."""
    return NamedSharding(mesh, PartitionSpec(axis))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch pytree onto the mesh, batch-dim sharded."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def make_data_sampler(num_examples: int, shuffle: bool, seed: int, epoch: int):
    """Deterministic epoch permutation (reference: DistributedSampler).

    Sharding across hosts is by contiguous slice of the permutation; the
    per-device split happens on-device via the batch sharding.
    """
    rng = np.random.RandomState(seed + epoch)
    order = rng.permutation(num_examples) if shuffle else np.arange(num_examples)
    world, rank = get_world_size(), get_rank()
    if world > 1:
        per = int(np.ceil(num_examples / world))
        pad = per * world - num_examples
        if pad:
            order = np.concatenate([order, order[:pad]])
        order = order[rank * per : (rank + 1) * per]
    return order
