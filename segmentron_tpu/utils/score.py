"""Segmentation metrics: streaming confusion-matrix pixAcc / mIoU.

TPU-native re-design of the reference metric
(reference: ``segmentron/utils/score.py::SegmentationMetric``,
``batch_pix_accuracy``, ``batch_intersection_union``): instead of
per-batch host-side histograms + an NCCL allreduce at the end, we keep a
single ``nclass x nclass`` int64 confusion matrix. The per-batch update is
a pure jittable function (one fused scatter-add on device); cross-replica
reduction is a ``psum`` over the mesh inside the sharded eval step. The
confusion matrix yields pixAcc / IoU / mIoU *and* the bit-for-bit class
histograms the baseline contract requires.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "confusion_matrix_update",
    "SegmentationMetric",
    "batch_pix_accuracy",
    "batch_intersection_union",
]


@partial(jax.jit, static_argnames=("num_classes",))
def confusion_matrix_update(
    pred: jax.Array, target: jax.Array, num_classes: int
) -> jax.Array:
    """Compute an ``(num_classes, num_classes)`` confusion matrix.

    ``pred``: int class ids, any shape. ``target``: same shape; pixels with
    ``target < 0`` or ``target >= num_classes`` are ignored (the reference
    masks ``target == ignore_index``; we fold any ignore id into the
    out-of-range mask by pre-mapping it to -1 in the dataset layer).
    Rows = target class, cols = predicted class.
    """
    pred = pred.reshape(-1).astype(jnp.int32)
    target = target.reshape(-1).astype(jnp.int32)
    valid = (target >= 0) & (target < num_classes)
    # Fold invalid pixels onto index 0 with weight 0.
    idx = jnp.where(valid, target * num_classes + jnp.clip(pred, 0, num_classes - 1), 0)
    weights = valid.astype(jnp.int32)
    cm = jnp.zeros((num_classes * num_classes,), jnp.int32).at[idx].add(weights)
    return cm.reshape(num_classes, num_classes)


def batch_pix_accuracy(pred: jax.Array, target: jax.Array, num_classes: int):
    """(correct, labeled) pixel counts — reference-compatible helper."""
    cm = confusion_matrix_update(pred, target, num_classes)
    correct = jnp.trace(cm)
    labeled = jnp.sum(cm)
    return correct, labeled


def batch_intersection_union(pred: jax.Array, target: jax.Array, num_classes: int):
    """(intersection, union) per class — reference-compatible helper."""
    cm = confusion_matrix_update(pred, target, num_classes)
    inter = jnp.diag(cm)
    union = cm.sum(0) + cm.sum(1) - inter
    return inter, union


class SegmentationMetric:
    """Streaming metric accumulator.

    ``update`` accepts logits ``(..., H, W, C)`` or hard predictions and
    int targets; accumulation stays in int64 numpy on host (tiny:
    nclass^2), so eval loops never re-jit on batch-count.
    """

    def __init__(self, nclass: int, distributed: bool = False):
        self.nclass = nclass
        self.distributed = distributed
        self.reset()

    def reset(self) -> None:
        self._cm = np.zeros((self.nclass, self.nclass), np.int64)

    def update(self, preds, labels) -> None:
        preds = jnp.asarray(preds)
        labels = jnp.asarray(labels)
        if preds.ndim == labels.ndim + 1:  # logits -> argmax over channel (last)
            preds = jnp.argmax(preds, axis=-1)
        cm = confusion_matrix_update(preds, labels, self.nclass)
        self._cm += np.asarray(jax.device_get(cm), np.int64)

    def update_cm(self, cm) -> None:
        """Merge an externally computed confusion matrix (e.g. psum'd)."""
        self._cm += np.asarray(jax.device_get(cm), np.int64)

    @property
    def confusion_matrix(self) -> np.ndarray:
        return self._cm.copy()

    def class_histogram(self) -> np.ndarray:
        """Target-class pixel counts (bit-for-bit comparison artifact)."""
        return self._cm.sum(1)

    def get(self, return_category_iou: bool = False):
        """Returns (pixAcc, mIoU) following reference semantics: classes
        that never appear in target *or* prediction (union == 0) are
        excluded from the mean via nan-mean."""
        total = self._cm.sum()
        pix_acc = np.diag(self._cm).sum() / max(total, 1)
        inter = np.diag(self._cm).astype(np.float64)
        union = self._cm.sum(0) + self._cm.sum(1) - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            iou = np.where(union > 0, inter / np.maximum(union, 1), np.nan)
        miou = np.nanmean(iou) if np.any(union > 0) else 0.0
        if return_category_iou:
            return float(pix_acc), float(miou), iou
        return float(pix_acc), float(miou)
