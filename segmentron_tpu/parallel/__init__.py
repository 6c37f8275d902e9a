"""Parallelism layer: meshes, shardings, and spatial (GSPMD) partitioning.

SURVEY.md §2.9 accounting — the reference's only strategy is DDP data
parallelism (plus SyncBatchNorm's stats allreduce); the TPU rebuild
provides:

- data parallel: batch-sharded ``shard_map`` train/eval steps
  (``engine.steps``) over the ``('data',)`` mesh axis;
- cross-replica BN: ``lax.pmean`` inside the norm layers;
- spatial partitioning (the vision analogue of sequence/tensor
  parallelism): GSPMD-sharded inference over a ``('data','model')``
  mesh where the image *height* is split across ``model`` — XLA inserts
  conv halo exchanges automatically (``spatial``). Used for full-res
  1024x2048 eval when one chip's HBM can't hold the activations.
"""

from ..utils.distributed import (
    batch_sharding,
    create_mesh,
    replicate_sharding,
    shard_batch,
)
from .spatial import (
    make_spatial_predict_fn,
    make_spatial_train_step,
    spatial_sharding,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicate_sharding",
    "shard_batch",
    "spatial_sharding",
    "make_spatial_predict_fn",
    "make_spatial_train_step",
]
