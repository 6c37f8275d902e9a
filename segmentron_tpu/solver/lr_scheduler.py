"""LR schedules (reference: ``segmentron/solver/lr_scheduler.py::WarmupPolyLR``).

Optax-style pure ``step -> lr`` functions (per-iteration, like the
reference). Poly decay with linear/constant warmup:

    warmup:  lr = base * poly(step) * (factor + (1-factor) * step/warmup)
    after:   lr = base * (1 - step/max_iters)^power
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp

__all__ = ["warmup_poly_lr", "warmup_cosine_lr", "warmup_step_lr", "get_lr_scheduler"]


def _warmup_factor(step, warmup_iters: int, factor: float, method: str):
    if warmup_iters <= 0:
        return 1.0
    alpha = jnp.clip(step / warmup_iters, 0.0, 1.0)
    if method == "constant":
        return jnp.where(step < warmup_iters, factor, 1.0)
    return jnp.where(step < warmup_iters, factor * (1 - alpha) + alpha, 1.0)


def warmup_poly_lr(
    base_lr: float,
    max_iters: int,
    power: float = 0.9,
    warmup_iters: int = 0,
    warmup_factor: float = 1.0 / 3,
    warmup_method: str = "linear",
) -> Callable:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        poly = jnp.power(
            jnp.clip(1.0 - step / max(max_iters, 1), 0.0, 1.0), power
        )
        return base_lr * poly * _warmup_factor(
            step, warmup_iters, warmup_factor, warmup_method
        )

    return schedule


def warmup_cosine_lr(
    base_lr: float,
    max_iters: int,
    warmup_iters: int = 0,
    warmup_factor: float = 1.0 / 3,
    warmup_method: str = "linear",
) -> Callable:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        t = jnp.clip(step / max(max_iters, 1), 0.0, 1.0)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * t))
        return base_lr * cos * _warmup_factor(
            step, warmup_iters, warmup_factor, warmup_method
        )

    return schedule


def warmup_step_lr(
    base_lr: float,
    decay_steps: Sequence[int],
    gamma: float = 0.1,
    warmup_iters: int = 0,
    warmup_factor: float = 1.0 / 3,
    warmup_method: str = "linear",
) -> Callable:
    decay_steps = jnp.asarray(list(decay_steps), jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        n_decays = jnp.sum(step >= decay_steps)
        return (
            base_lr
            * jnp.power(gamma, n_decays)
            * _warmup_factor(step, warmup_iters, warmup_factor, warmup_method)
        )

    return schedule


def get_lr_scheduler(cfg, iters_per_epoch: int) -> Callable:
    """Build the configured scheduler (per-iteration, reference-style)."""
    max_iters = int(cfg.TRAIN.EPOCHS * iters_per_epoch)
    warmup_iters = int(cfg.SOLVER.WARMUP.EPOCHS * iters_per_epoch)
    kind = cfg.SOLVER.LR_SCHEDULER.lower()
    if kind == "poly":
        return warmup_poly_lr(
            float(cfg.SOLVER.LR), max_iters, float(cfg.SOLVER.POLY.POWER),
            warmup_iters, float(cfg.SOLVER.WARMUP.FACTOR), cfg.SOLVER.WARMUP.METHOD,
        )
    if kind == "cosine":
        return warmup_cosine_lr(
            float(cfg.SOLVER.LR), max_iters, warmup_iters,
            float(cfg.SOLVER.WARMUP.FACTOR), cfg.SOLVER.WARMUP.METHOD,
        )
    if kind == "step":
        return warmup_step_lr(
            float(cfg.SOLVER.LR),
            [int(e * iters_per_epoch) for e in cfg.SOLVER.STEP.DECAY_EPOCH],
            float(cfg.SOLVER.STEP.GAMMA),
            warmup_iters, float(cfg.SOLVER.WARMUP.FACTOR), cfg.SOLVER.WARMUP.METHOD,
        )
    raise ValueError(f"Unknown LR_SCHEDULER: {kind}")
