"""Serialized-model export for serving (no reference analogue — the
reference's only inference surface is ``tools/demo.py``).

``jax.export`` serializes the jitted forward (StableHLO + calling
convention) together with the trained variables, so a serving process
can run the model WITHOUT the model zoo, config tree, or flax — just
jax and the artifact directory:

    exp = load_exported(path)          # deserialize
    logits = exp.call(variables, images)

The StableHLO is platform-checked at load (export on TPU -> serve on
TPU); variables ride alongside as an .npz of flattened leaves.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from .steps import _cast_floats

__all__ = ["export_model", "load_exported"]

_MLIR_FILE = "model.stablehlo"
_VARS_FILE = "variables.npz"
_META_FILE = "meta.json"


def _flatten_vars(variables) -> dict:
    """Flax variables are nested string-keyed dicts; store each leaf
    under its '/'-joined key path so loading rebuilds the exact tree
    with no side-channel treedef."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_vars(flat: dict):
    tree: dict = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def export_model(model, variables, input_shape, out_dir: str,
                 compute_dtype=jnp.float32) -> str:
    """Serialize ``model.apply`` (eval mode, main logits) + variables."""
    os.makedirs(out_dir, exist_ok=True)
    mixed = jnp.dtype(compute_dtype) != jnp.float32

    def forward(variables, images):
        # mirror make_predict_fn's mixed-precision semantics: the
        # served graph must cast params to the compute dtype (true-bf16
        # MXU path) or the artifact computes f32 with bf16 inputs and
        # diverges from what was benchmarked; logits stay f32
        if mixed:
            variables = dict(variables)
            variables["params"] = _cast_floats(
                variables["params"], jnp.dtype(compute_dtype)
            )
        return model.apply(variables, images, False)[0].astype(jnp.float32)

    x_spec = jax.ShapeDtypeStruct(tuple(input_shape), compute_dtype)
    var_specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables
    )
    exported = jax_export.export(jax.jit(forward))(var_specs, x_spec)
    with open(os.path.join(out_dir, _MLIR_FILE), "wb") as f:
        f.write(exported.serialize())

    flat = _flatten_vars(variables)
    np.savez(os.path.join(out_dir, _VARS_FILE), **flat)
    with open(os.path.join(out_dir, _META_FILE), "w") as f:
        json.dump(
            {
                "input_shape": list(input_shape),
                "dtype": str(np.dtype(compute_dtype)),
                "n_leaves": len(flat),
            },
            f,
            indent=2,
        )
    return out_dir


class LoadedModel:
    def __init__(self, exported, variables):
        self._exported = exported
        self.variables = variables

    def __call__(self, images):
        return self._exported.call(self.variables, images)


def load_exported(out_dir: str) -> LoadedModel:
    """Deserialize an exported model + its variables tree."""
    with open(os.path.join(out_dir, _MLIR_FILE), "rb") as f:
        exported = jax_export.deserialize(f.read())
    data = np.load(os.path.join(out_dir, _VARS_FILE))
    variables = _unflatten_vars({k: data[k] for k in data.files})
    return LoadedModel(exported, variables)
