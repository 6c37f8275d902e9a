"""Full-res attention-model component map on the real chip (VERDICT r3
next-round #2).

DANet / OCNet @1024x2048 b1 eval (the BASELINE config #5 capability
datapoints: 21.75 / 26.94 img/s in r3) decomposed the same way the
flagship was: backbone vs head(+attention), plus a blockwise-attention
block-size sweep at the real sequence length (OS8 of 1024x2048 ->
128x256 = 32768 positions).

One fresh graph per invocation (remote compiles are minutes); selected
by MAP_MODE:

  danet_full / ocnet_full           whole model eval forward
  danet_backbone / ocnet_backbone   ResNet-101 OS8 c1..c4 only
  sweep                             standalone blockwise-attention
                                    block_q x block_k timing grid at
                                    P=32768 (ATTN_DK/ATTN_DV set the
                                    head geometry; defaults = DANet PAM)

Methodology identical to bench.py: pre-cast bf16 params on CPU, ONE
jitted fori_loop with the anti-hoisting perturbation threaded through
the stem conv1 kernel (params, never the input — pallas graphs repay an
input relayout per iteration otherwise), scalar readback stops the
clock. Env: MAP_H/MAP_W (1024/2048), MAP_ITERS (20).
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
    print(f"[attn_map +{time.time() - T0:8.1f}s] {msg}", file=sys.stderr, flush=True)


def wait_for_backend():
    for _ in range(30):
        try:
            return jax.default_backend()
        except RuntimeError as e:
            log(f"backend unavailable ({e}); retry in 60s")
            time.sleep(60)
    raise RuntimeError("backend never came up")


def sweep(iters: int):
    """block_q x block_k grid for the flash kernel at P=32768, plus an
    XLA full-affinity einsum reference at the same geometry.

    Harness note: the original sweep perturbed q with `q + 0.0*acc`
    (input-carried) and measured ≥65 ms/call — ~4x the whole in-model
    DANet head delta (18.4 ms), i.e. the known input-carried+pallas
    relayout phantom (BASELINE.md "Harness correction"). This version
    chains through a tiny feedback into k (true dependence, 4 MB
    operand) and cross-checks against the XLA path.
    """
    from segmentron_tpu.ops.attention import _attention_pallas, _attention_xla

    p = int(os.environ.get("ATTN_P", 32768))
    dk = int(os.environ.get("ATTN_DK", 64))
    dv = int(os.environ.get("ATTN_DV", 512))
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(1, p, dk), jnp.bfloat16)
    k = jnp.asarray(rs.randn(1, p, dk), jnp.bfloat16)
    v = jnp.asarray(rs.randn(1, p, dv), jnp.bfloat16)
    results = {}

    def timed(make_out):
        @functools.partial(jax.jit, static_argnums=(3,))
        def run(q, k, v, n):
            def body(i, kk):
                out = make_out(q, kk, v)
                return kk + out.mean().astype(kk.dtype) * jnp.bfloat16(1e-30)

            kk = jax.lax.fori_loop(0, n, body, k)
            return kk[0, 0, 0].astype(jnp.float32)

        warm = float(run(q, k, v, 1))
        assert np.isfinite(warm)
        t0 = time.perf_counter()
        float(run(q, k, v, iters))
        return (time.perf_counter() - t0) / iters * 1000.0

    for bq in (256, 512, 1024):
        for bk in (512, 1024, 2048):
            try:
                ms = timed(
                    lambda q, kk, v, _bq=bq, _bk=bk: _attention_pallas(
                        q, kk, v, 1.0, block_q=_bq, block_k=_bk
                    )[0]
                )
                results[f"{bq}x{bk}"] = round(ms, 3)
                log(f"bq={bq} bk={bk}: {ms:.3f} ms")
            except Exception as e:  # compile-time VMEM OOM etc.
                results[f"{bq}x{bk}"] = f"fail: {type(e).__name__}"
                log(f"bq={bq} bk={bk}: FAILED {e}")
    try:
        ms = timed(lambda q, kk, v: _attention_xla(q, kk, v, 1.0))
        results["xla"] = round(ms, 3)
        log(f"xla einsum: {ms:.3f} ms")
    except Exception as e:  # HBM OOM at large P
        results["xla"] = f"fail: {type(e).__name__}"
        log(f"xla einsum FAILED: {e}")
    print(
        json.dumps(
            {"tool": "attn_map", "mode": "sweep", "p": p, "dk": dk, "dv": dv,
             "iters": iters, "ms": results}
        ),
        flush=True,
    )


def main():
    from segmentron_tpu.config import cfg
    from segmentron_tpu.utils.compileopts import tpu_compiler_options

    mode = os.environ.get("MAP_MODE", "danet_full")
    h = int(os.environ.get("MAP_H", 1024))
    w = int(os.environ.get("MAP_W", 2048))
    iters = int(os.environ.get("MAP_ITERS", 20))

    wait_for_backend()
    if mode == "sweep":
        return sweep(iters)

    model_name, part = mode.split("_", 1)
    cfg.defrost()
    cfg.DATASET.NAME = "cityscapes"
    cfg.MODEL.BACKBONE = "resnet101"
    cfg.MODEL.OUTPUT_STRIDE = 8
    cfg.SOLVER.AUX = False
    cfg.TRAIN.SYNC_BATCH_NORM = False
    if model_name == "hrnet":
        # config #4 (HRNet-W48 + OCR) — BasicBlock int8 A/B
        cfg.MODEL.MODEL_NAME = "HRNet"
        cfg.MODEL.BACKBONE = "hrnet_w48"
        cfg.MODEL.HRNET.OCR.ENABLE = True
    elif model_name == "danet":
        # config #5a backbone settings (multi-grid layer4; MAP_MG=0
        # A/Bs the plain-dilation layer4 the model-zoo config uses)
        cfg.MODEL.MODEL_NAME = "DANet"
        if os.environ.get("MAP_MG", "1") != "0":
            cfg.MODEL.DANET.MULTI_GRID = True
            cfg.MODEL.DANET.MULTI_DILATION = [4, 8, 16]
    else:
        cfg.MODEL.MODEL_NAME = "OCNet"
        cfg.MODEL.OCNet.OC_ARCH = "base"

    if os.environ.get("MAP_INT8", "0") == "1":
        # int8 interior hops in the ResNet bottlenecks (TPU.INT8_RESNET)
        cfg.TPU.INT8_RESNET = True

    if part == "backbone":
        from segmentron_tpu.models.backbones import get_segmentation_backbone
        from segmentron_tpu.modules.batch_norm import norm_from_cfg

        module = get_segmentation_backbone("resnet101", norm_from_cfg(cfg))
        stem = ("params", "conv1", "kernel")

        def forward(v, x):
            outs = module.apply(v, x, False)
            return outs[-1]

    else:
        from segmentron_tpu.models import get_segmentation_model

        module = get_segmentation_model()
        stem = (
            ("params", "backbone", "stem1", "conv", "kernel")
            if model_name == "hrnet"
            else ("params", "backbone", "conv1", "kernel")
        )

        def forward(v, x):
            return module.apply(v, x, False)[0]

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

    chained = os.environ.get("MAP_CHAIN", "0") == "1"

    @functools.partial(jax.jit, compiler_options=tpu_compiler_options())
    def timed(v, images, n):
        if chained:
            # TRUE input-carried dependence (ceiling_probe::backbone
            # form): out feeds the next iteration's image by a 1e-30
            # nudge bf16 rounds away. Cross-checks the 0*acc perturb
            # on pallas-bearing graphs.
            def body(i, xx):
                out = forward(v, xx)
                eps = out.mean().astype(xx.dtype) * jnp.asarray(1e-30, xx.dtype)
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
            out = forward(vp, images)
            acc = acc + out.mean().astype(jnp.float32)
            return acc, 0.0 * acc

        return jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), jnp.float32(0.0)))[0]

    log("compiling (remote compile may take many minutes)")
    v0 = float(np.asarray(timed(variables, x, 1)))
    assert np.isfinite(v0), v0
    log(f"compiled (warm {v0:.4f}); timing")
    t0 = time.perf_counter()
    v1 = float(np.asarray(timed(variables, x, iters)))
    dt = time.perf_counter() - t0
    assert np.isfinite(v1), v1
    ms = dt / iters * 1000.0
    print(
        json.dumps(
            {"tool": "attn_map", "mode": mode, "h": h, "w": w, "iters": iters,
             "chain": chained,
             "ms_per_iter": round(ms, 2), "img_per_s": round(iters / dt, 2)}
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
