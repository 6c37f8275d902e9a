"""HRNet-W48 + OCR full-res component map on the real chip
(VERDICT r4 next-round #3).

Config #4 (HRNet-W48+OCR @1024x2048 b1 eval, 19.5-19.7 img/s in r3/r4)
was judged "at compute floor" against the SUPERSEDED 67.7 TF ceiling;
against the corrected 70-88 TF conv band its ~2.8 TFLOP forward floors
at ~32-40 ms vs 51.3 measured — a nominal 1.3-1.6x open. This tool
produces the prefix bisection that decides it: stem / stage2 / stage3 /
stage4 (each stage includes its transition convs and fuse/exchange
bundles) / concat-classifier head / OCR head, with XLA cost-analysis
FLOPs per prefix so every stage gets an effective-TF verdict.

One fresh graph per invocation (remote compiles are minutes), selected
by MAP_MODE:

  stem | stage1 | stage2 | stage3 | stage4   backbone prefixes
  head_noocr                                 backbone + HRNetV2 concat head
  full                                       + OCR (the config #4 model)

Methodology identical to bench.py/attn_map.py: bf16 pre-cast params on
CPU, one jitted fori_loop, anti-hoisting via the stem1 conv kernel
(param-perturb; validated <2% vs true input chaining in r4), scalar
readback. MAP_CHAIN=1 switches to the input-chained form. MAP_COST=1
additionally prints the XLA cost-analysis FLOPs of the part graph.
Env: MAP_H/MAP_W (1024/2048), MAP_ITERS (20).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

T0 = time.time()


def log(msg):
    print(f"[hrnet_map +{time.time() - T0:8.1f}s] {msg}", file=sys.stderr,
          flush=True)


def wait_for_backend():
    for _ in range(30):
        try:
            return jax.default_backend()
        except RuntimeError as e:
            log(f"backend unavailable ({e}); retry in 60s")
            time.sleep(60)
    raise RuntimeError("backend never came up")


def main():
    from segmentron_tpu.config import cfg
    from segmentron_tpu.utils.compileopts import tpu_compiler_options

    mode = os.environ.get("MAP_MODE", "full")
    h = int(os.environ.get("MAP_H", 1024))
    w = int(os.environ.get("MAP_W", 2048))
    iters = int(os.environ.get("MAP_ITERS", 20))

    cfg.defrost()
    cfg.DATASET.NAME = "cityscapes"
    cfg.MODEL.MODEL_NAME = "HRNet"
    cfg.MODEL.BACKBONE = "hrnet_w48"
    cfg.MODEL.HRNET.OCR.ENABLE = mode == "full"
    cfg.SOLVER.AUX = False
    cfg.TRAIN.SYNC_BATCH_NORM = False

    wait_for_backend()

    if mode in ("stem", "stage1", "stage2", "stage3", "stage4"):
        from segmentron_tpu.models.backbones.hrnet import HRNet
        from segmentron_tpu.modules.batch_norm import norm_from_cfg

        module = HRNet(
            spec_name="hrnet_w48",
            norm=norm_from_cfg(cfg),
            stop_stage="" if mode == "stage4" else mode,
        )
        stem = ("params", "stem1", "conv", "kernel")

        def forward(v, x):
            outs = module.apply(v, x, False)
            # consume every branch so none is DCE'd
            return sum(o.mean().astype(jnp.float32) for o in outs)

    else:  # head_noocr | full
        from segmentron_tpu.models import get_segmentation_model

        module = get_segmentation_model()
        stem = ("params", "backbone", "stem1", "conv", "kernel")

        def forward(v, x):
            return module.apply(v, x, False)[0].mean().astype(jnp.float32)

    log(f"mode={mode}; init on CPU")
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = jax.jit(module.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3), jnp.float32)
        )
    variables = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32
        else a,
        dict(variables),
    )
    dev = jax.devices()[0]
    variables = jax.device_put(variables, dev)
    x = jax.device_put(jnp.zeros((1, h, w, 3), jnp.bfloat16), dev)

    flops = None
    if os.environ.get("MAP_COST", "0") == "1":
        try:
            # the axon backend returns None from cost_analysis — lower
            # for the CPU backend instead (FLOP counts are
            # platform-independent)
            with jax.default_device(cpu):
                cost = (
                    jax.jit(forward)
                    .lower(
                        jax.tree.map(
                            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                            variables,
                        ),
                        jax.ShapeDtypeStruct(x.shape, x.dtype),
                    )
                    .cost_analysis()
                )
            flops = float(cost.get("flops", float("nan"))) if cost else None
            if flops is not None:
                log(f"XLA cost-analysis flops: {flops:.3e}")
        except Exception as e:
            log(f"cost analysis failed: {e}")
    if os.environ.get("MAP_COST_ONLY", "0") == "1":
        print(json.dumps({
            "tool": "hrnet_map", "mode": mode, "h": h, "w": w,
            "xla_flops": flops,
        }), flush=True)
        return

    chained = os.environ.get("MAP_CHAIN", "0") == "1"

    @functools.partial(jax.jit, compiler_options=tpu_compiler_options())
    def timed(v, images, n):
        if chained:
            def body(i, xx):
                out = forward(v, xx)
                eps = out.astype(xx.dtype) * jnp.asarray(1e-30, xx.dtype)
                return xx + eps

            xx = jax.lax.fori_loop(0, n, body, images)
            return xx[0, 0, 0, 0].astype(jnp.float32)

        def body(i, carry):
            acc, eps = carry
            vp = jax.tree.map(lambda a: a, v)
            node = vp
            for key in stem[:-1]:
                node = node[key]
            node[stem[-1]] = node[stem[-1]] + eps.astype(node[stem[-1]].dtype)
            acc = acc + forward(vp, images)
            return acc, 0.0 * acc

        return jax.lax.fori_loop(
            0, n, body, (jnp.float32(0.0), jnp.float32(0.0))
        )[0]

    log("compiling (remote compile may take many minutes)")
    v0 = float(np.asarray(timed(variables, x, 1)))
    assert np.isfinite(v0), v0
    log(f"compiled (warm {v0:.4f}); timing")
    t0 = time.perf_counter()
    v1 = float(np.asarray(timed(variables, x, iters)))
    dt = time.perf_counter() - t0
    assert np.isfinite(v1), v1
    ms = dt / iters * 1000.0
    out = {
        "tool": "hrnet_map", "mode": mode, "h": h, "w": w, "iters": iters,
        "chain": chained, "ms_per_iter": round(ms, 2),
        "img_per_s": round(iters / dt, 2),
    }
    if flops is not None:
        out["xla_flops"] = flops
        out["eff_tflops"] = round(flops / (ms / 1000.0) / 1e12, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
