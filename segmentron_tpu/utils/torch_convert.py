"""torch <-> jax weight conversion primitives.

Needed for (a) importing ImageNet-pretrained backbone checkpoints saved
by torch, and (b) the parity-fixture tests that validate our modules
against torch-CPU oracles (SURVEY.md §4). Layout conventions:

- torch Conv2d weight: (O, I/groups, kH, kW)   [OIHW]
- flax  Conv kernel:   (kH, kW, I/groups, O)   [HWIO]
- torch depthwise (groups=C): (C*mult, 1, kH, kW) -> flax (kH, kW, 1, C*mult)
  via the same OIHW->HWIO transpose (flax ``feature_group_count=C``).
- torch Linear: (O, I) -> flax Dense kernel (I, O).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

__all__ = [
    "t2j_conv_kernel",
    "t2j_dense_kernel",
    "t2j_bn",
    "load_torch_state_dict",
]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def t2j_conv_kernel(weight) -> np.ndarray:
    """OIHW -> HWIO."""
    return _np(weight).transpose(2, 3, 1, 0)


def t2j_dense_kernel(weight) -> np.ndarray:
    """(O, I) -> (I, O)."""
    return _np(weight).transpose(1, 0)


def t2j_bn(bn_module) -> Dict[str, Dict[str, np.ndarray]]:
    """torch BatchNorm2d -> flax {'params': {scale,bias}, 'batch_stats': {mean,var}}."""
    return {
        "params": {"scale": _np(bn_module.weight), "bias": _np(bn_module.bias)},
        "batch_stats": {
            "mean": _np(bn_module.running_mean),
            "var": _np(bn_module.running_var),
        },
    }


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a torch checkpoint file into numpy arrays (no torch tensors leak)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return {k: _np(v) for k, v in state.items() if hasattr(v, "detach")}
