"""Measured-amax int8 calibration (VERDICT r2 weak #5).

The default int8 ranges derive from BN statistics (``ops/quant.py::
bn_amax`` — |bias| + 6 sigma, fusion-friendly, no data needed). This
module provides the measured fallback: run N batches through the f32
model with ``cfg.TPU.INT8_CALIBRATE`` set, each quant site records its
running per-channel |max| into the ``quant_amax`` flax collection
(``ops/quant.py::observe_amax``), and the returned variables carry the
collection — the int8 path then quantizes with the measured ranges
(``site_amax``) instead of the heuristic.

Still STATIC quantization: the measured scales are constants at int8
trace time, so the quantize step keeps fusing into the producer conv's
epilogue (a dynamic per-batch scale would re-read the tensor and give
the bandwidth win back — see ops/quant.py module docstring).
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp

from ..config import cfg

__all__ = ["calibrate_int8_amax"]


def calibrate_int8_amax(model, variables, batches: Iterable) -> dict:
    """Run ``batches`` (arrays or dicts with "image") through the f32
    model, accumulating per-site activation ranges. Returns ``variables``
    with the ``quant_amax`` collection added/updated."""
    was = cfg.TPU.INT8_CALIBRATE
    cfg.defrost()
    cfg.TPU.INT8_CALIBRATE = True
    try:
        @jax.jit
        def observe(variables, images):
            from ..ops.preprocess import maybe_normalize

            images = maybe_normalize(images)  # raw-uint8 loader mode
            _, col = model.apply(
                variables, images, False, mutable=["quant_amax"]
            )
            # models without quant sites (plain-conv backbones) sow
            # nothing: empty collection, not an error
            return col.get("quant_amax", {})

        variables = dict(variables)
        if "quant_amax" in variables:
            # calibration must be idempotent: observe_amax's running
            # max seeds from the passed-in collection, so stale (and
            # headroom-widened) ranges would dominate fresh
            # measurements and the tail multiplier would compound
            # (1.25^k over k calibrations). Start every calibration
            # from zeros.
            variables["quant_amax"] = jax.tree.map(
                jnp.zeros_like, variables["quant_amax"]
            )
        n = 0
        for batch in batches:
            images = batch["image"] if isinstance(batch, dict) else batch
            images = jnp.asarray(images)
            if images.ndim == 3:
                images = images[None]
            if n == 0 and "quant_amax" not in variables:
                # adding the collection key changes the pytree
                # structure, which would RETRACE the jitted observe for
                # batch 2 — a second multi-minute remote compile. Seed
                # the structure with a CPU-jitted first pass (CPU
                # compiles locally in ~a minute), so the accelerator
                # program compiles exactly once, for batches 1..N.
                cpu = jax.devices("cpu")[0]
                with jax.default_device(cpu):
                    from ..ops.preprocess import maybe_normalize as _mn

                    col = jax.jit(
                        lambda v, im: model.apply(
                            v, _mn(im), False, mutable=["quant_amax"]
                        )[1].get("quant_amax", {})
                    )(variables, jax.device_put(images, cpu))
                if col:
                    variables["quant_amax"] = jax.tree.map(
                        jnp.zeros_like, col
                    )
                else:  # no quant sites: skip the device loop entirely
                    n = len(list(batches)) + 1
                    break
            col = observe(variables, images)
            if col:
                variables["quant_amax"] = col
            n += 1
        if n == 0:
            raise ValueError("calibrate_int8_amax: no batches provided")
        headroom = float(cfg.TPU.INT8_CALIBRATION_HEADROOM)
        if headroom != 1.0 and "quant_amax" in variables:
            # N batches under-sample the eval tails: the raw max CLIPS
            # outliers the 6-sigma heuristic covers (BASELINE.md int8
            # accuracy table). Headroom widens the measured ranges.
            variables["quant_amax"] = jax.tree.map(
                lambda a: a * headroom, variables["quant_amax"]
            )
        if "quant_amax" not in variables:
            from ..utils import get_logger

            get_logger().warning(
                "int8 calibration found no quantization sites in this "
                "model (no int8-capable layers) — heuristic ranges stay"
            )
    finally:
        cfg.TPU.INT8_CALIBRATE = was
    return variables
