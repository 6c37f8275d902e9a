"""Optimizer factory (reference: ``segmentron/solver/optimizer.py``).

Torch-SGD-equivalent optax chain with the reference's param-group
split: parameters under the ``backbone`` scope train at ``SOLVER.LR``,
everything else (decoder/heads) at ``LR x DECODER_LR_FACTOR``.

torch SGD semantics reproduced exactly: grad += wd * p; buf = momentum
* buf + grad; p -= lr * buf (coupled weight decay, no dampening).
"""

from __future__ import annotations

from typing import Callable

import jax
import optax

__all__ = ["get_optimizer", "backbone_decoder_labels"]


def backbone_decoder_labels(params) -> dict:
    """Label tree: 'backbone' for params under the backbone scope."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_tree(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "backbone"
            if any(
                getattr(k, "key", None) == "backbone" for k in path
            )
            else "decoder",
            tree,
        )

    return label_tree(params)


def _sgd_group(schedule: Callable, momentum: float, weight_decay: float):
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_schedule(lambda s: -schedule(s)),
    )


def _adam_group(schedule: Callable, eps: float, weight_decay: float, adamw: bool):
    if adamw:
        return optax.chain(
            optax.scale_by_adam(eps=eps),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_schedule(lambda s: -schedule(s)),
        )
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(eps=eps),
        optax.scale_by_schedule(lambda s: -schedule(s)),
    )


def get_optimizer(cfg, params, lr_schedule: Callable) -> optax.GradientTransformation:
    name = cfg.SOLVER.OPTIMIZER.lower()
    momentum = float(cfg.SOLVER.MOMENTUM)
    wd = float(cfg.SOLVER.WEIGHT_DECAY)
    eps = float(cfg.SOLVER.EPSILON)
    factor = float(cfg.SOLVER.DECODER_LR_FACTOR)
    decoder_schedule = lambda s: lr_schedule(s) * factor  # noqa: E731

    if name == "sgd":
        make = lambda sched: _sgd_group(sched, momentum, wd)  # noqa: E731
    elif name == "adam":
        make = lambda sched: _adam_group(sched, eps, wd, adamw=False)  # noqa: E731
    elif name == "adamw":
        make = lambda sched: _adam_group(sched, eps, wd, adamw=True)  # noqa: E731
    else:
        raise ValueError(f"Unknown optimizer: {name}")

    labels = backbone_decoder_labels(params)
    return optax.multi_transform(
        {"backbone": make(lr_schedule), "decoder": make(decoder_schedule)},
        labels,
    )
