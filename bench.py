"""Benchmark: Cityscapes 1024x2048 images/sec/chip, DeepLabv3+/Xception-65
(the BASELINE.json north-star metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput number ("published": {}), so
``vs_baseline`` is the ratio against a fixed nominal of 1.0 img/s/chip
(documented here so rounds are comparable to each other).

Methodology notes (this container): the TPU is reached through a
loopback relay with ~60-90 ms per-dispatch latency, and
``block_until_ready`` does NOT block on it — so the timing loop runs
*inside* one jit (``lax.fori_loop`` with an input-dependence chain to
defeat loop-invariant hoisting) and the clock stops on a scalar
readback, which drains the pipeline.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

NOMINAL_BASELINE_IPS = 1.0  # img/s/chip; see module docstring


def main():
    from segmentron_tpu.config import cfg
    from segmentron_tpu.models import get_segmentation_model

    cfg.defrost()
    cfg.DATASET.NAME = "cityscapes"
    cfg.MODEL.MODEL_NAME = "DeepLabV3_Plus"
    cfg.MODEL.BACKBONE = "xception65"
    cfg.MODEL.OUTPUT_STRIDE = 16
    cfg.SOLVER.AUX = False
    model = get_segmentation_model()

    h, w = 1024, 2048
    on_tpu = jax.default_backend() != "cpu"
    compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    x = jnp.zeros((1, h, w, 3), compute_dtype)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))

    def forward(v, images):
        return model.apply(v, images, False)[0]

    @jax.jit
    def timed_loop(v, images, n):
        def body(i, carry):
            acc, img = carry
            out = forward(v, img)
            acc = acc + out.mean().astype(jnp.float32)
            # dependence chain: next input depends on this output, so XLA
            # cannot hoist the loop body
            img = img * (1.0 + 0.0 * acc).astype(img.dtype)
            return acc, img
        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), images))
        return acc

    iters = 10 if on_tpu else 1
    _ = np.asarray(timed_loop(variables, x, 1))  # compile + warm
    t0 = time.perf_counter()
    s = np.asarray(timed_loop(variables, x, iters))  # readback drains pipe
    dt = time.perf_counter() - t0
    assert np.isfinite(s)
    ips = iters * x.shape[0] / dt

    print(
        json.dumps(
            {
                "metric": "cityscapes_1024x2048_deeplabv3plus_xception65_inference",
                "value": round(float(ips), 4),
                "unit": "images/sec/chip",
                "vs_baseline": round(float(ips) / NOMINAL_BASELINE_IPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
