"""Normalization factory (reference: ``segmentron/modules/batch_norm.py``).

Maps ``cfg.MODEL.BN_TYPE`` to a normalization module:

- ``BN``      — per-replica BatchNorm (torch ``nn.BatchNorm2d``).
- ``SyncBN``  — cross-replica BatchNorm. The torch reference uses
  ``nn.SyncBatchNorm`` (an NCCL allgather of mean/var); here the batch
  statistics are reduced with ``lax.pmean`` over the ``data`` mesh axis
  *inside* the compiled step — XLA lowers it onto ICI, fusing it with
  surrounding compute. Enabled simply by constructing the norm with an
  ``axis_name`` and running the train step under ``shard_map``.
- ``FrozenBN`` — running statistics only, never updated (pretrained
  stems).
- ``GN``      — GroupNorm fallback.

Momentum convention: config carries the torch value (new-stat weight);
flax wants the decay ``1 - torch_momentum`` — converted here, once.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["NormConfig", "FrozenBatchNorm", "norm_from_cfg"]

_TORCH_BN_DEFAULT_MOMENTUM = 0.1
_TORCH_BN_DEFAULT_EPS = 1e-5


class FrozenBatchNorm(nn.Module):
    """BatchNorm that always uses (and never updates) running stats.

    Reference analogue: ``FrozenBatchNorm2d``. Scale/bias and the
    statistics live in the usual flax collections so torch checkpoints
    convert uniformly; ``use_running_average`` is forced True so the
    stats are never touched and no cross-replica collective is emitted.
    """

    epsilon: float = _TORCH_BN_DEFAULT_EPS
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,))
        ).value
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,))
        ).value
        inv = jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        out = (x - mean) * inv * scale + bias
        return out.astype(x.dtype)


@dataclasses.dataclass(frozen=True)
class NormConfig:
    """Static norm configuration threaded through model constructors."""

    bn_type: str = "BN"  # BN | SyncBN | FrozenBN | GN
    eps: float = _TORCH_BN_DEFAULT_EPS
    torch_momentum: float = _TORCH_BN_DEFAULT_MOMENTUM
    axis_name: str = "data"
    group_count: int = 32

    def replace(self, **kw) -> "NormConfig":
        return dataclasses.replace(self, **kw)

    def with_eps(self, eps: Optional[float]) -> "NormConfig":
        return self if eps is None else self.replace(eps=float(eps))

    def make(self, name: Optional[str] = None) -> nn.Module:
        """Instantiate a norm module. Call it as ``norm(x, use_running_average=...)``."""
        if self.bn_type in ("BN", "SyncBN"):
            return nn.BatchNorm(
                momentum=1.0 - self.torch_momentum,
                epsilon=self.eps,
                axis_name=self.axis_name if self.bn_type == "SyncBN" else None,
                name=name,
            )
        if self.bn_type == "FrozenBN":
            return FrozenBatchNorm(epsilon=self.eps, name=name)
        if self.bn_type == "GN":
            return _GroupNormAdapter(
                num_groups=self.group_count, epsilon=self.eps, name=name
            )
        raise ValueError(f"Unknown BN_TYPE: {self.bn_type}")


class _GroupNormAdapter(nn.Module):
    """GroupNorm accepting the BatchNorm call signature."""

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        return nn.GroupNorm(num_groups=self.num_groups, epsilon=self.epsilon)(x)


def norm_from_cfg(cfg, encoder: bool = True) -> NormConfig:
    """Build a NormConfig from the global config tree.

    Honors BN_TYPE, BN_MOMENTUM (torch convention) and the split
    encoder/decoder epsilons (BN_EPS_FOR_ENCODER / BN_EPS_FOR_DECODER).
    """
    eps = cfg.MODEL.BN_EPS_FOR_ENCODER if encoder else cfg.MODEL.BN_EPS_FOR_DECODER
    bn_type = cfg.MODEL.BN_TYPE
    if bn_type == "BN" and cfg.TRAIN.SYNC_BATCH_NORM:
        bn_type = "SyncBN"
    if bn_type == "SyncBN":
        from ..utils.distributed import data_axis_size

        # Single-replica downgrade: pmean over a size-1 axis is the
        # identity, but XLA still emits the collective (~4 ms/step on
        # the v5e train config). Bit-exact: flax computes var the same
        # way (E[x^2] - E[x]^2) with or without axis_name, and the
        # stack/pmean/unstack is a value no-op at size 1. Also lets
        # single-chip scripts apply the model outside shard_map.
        if data_axis_size(cfg) == 1 and bool(cfg.TPU.ELIDE_COLLECTIVES):
            bn_type = "BN"
    return NormConfig(
        bn_type=bn_type,
        eps=float(eps) if eps is not None else _TORCH_BN_DEFAULT_EPS,
        torch_momentum=(
            float(cfg.MODEL.BN_MOMENTUM)
            if cfg.MODEL.BN_MOMENTUM is not None
            else _TORCH_BN_DEFAULT_MOMENTUM
        ),
        group_count=int(cfg.MODEL.DEFAULT_GROUP_NUMBER),
    )
