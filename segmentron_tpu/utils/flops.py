"""Model FLOPs / params reporting (reference: ``show_flops_params``,
logged at Trainer init — SURVEY.md §2.2).

The torch reference counts FLOPs with a thop-style module walker; on
TPU the compiler already knows: ``jax.jit(fn).lower(args)`` exposes
XLA's HLO cost analysis without executing anything. We lower against
the *CPU* backend so the report never pays a (slow, remote) TPU
compile and never touches the chip.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["count_params", "model_flops", "show_flops_params"]


def count_params(params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))


def model_flops(model, variables, input_shape: Tuple[int, ...]) -> Optional[float]:
    """Forward-pass FLOPs for one batch of ``input_shape`` (NHWC)."""
    def fwd(v, x):
        return model.apply(v, x, False)[0]

    x = jax.ShapeDtypeStruct(input_shape, jnp.float32)
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            lowered = jax.jit(fwd).lower(variables, x)
        cost = lowered.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception:  # cost analysis is best-effort across jax versions
        return None


def show_flops_params(model, variables, input_shape, logger) -> None:
    n_params = count_params(variables.get("params", variables))
    flops = model_flops(model, variables, input_shape)
    if flops:
        logger.info(
            "Model params: %.2fM, forward FLOPs @%s: %.2fG",
            n_params / 1e6,
            "x".join(map(str, input_shape[1:3])),
            flops / 1e9,
        )
    else:
        logger.info("Model params: %.2fM (FLOPs analysis unavailable)", n_params / 1e6)
