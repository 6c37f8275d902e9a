"""Spatial partitioning for full-resolution inference.

The (H, W) activation plane of a 1024x2048 Cityscapes image at OS8 with
an attention head can exceed one chip's HBM. The reference's answer is
crop-based sliding windows; the TPU-native answer is to *shard the
image height across chips* and let GSPMD insert the conv halo
exchanges: annotate the input as ``P(None, 'model', None, None)``
(NHWC), jit, done. Collectives ride ICI; no manual stitching.

This is the vision analogue of sequence parallelism (SURVEY.md §5.7).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["spatial_sharding", "make_spatial_predict_fn"]


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
