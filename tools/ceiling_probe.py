"""Definitive compute-ceiling probe with TRUE chained data dependence.

Motivation (round 4): the r2 "measured ceilings" (67.7 TFLOPs bf16 /
80.3 TOPS int8, BASELINE.md "Corrected roofline") came from a 4096^3
fori-loop chain, but r4's attn_map measured a ResNet-101-OS8 backbone
@1024x2048 (XLA cost-analysis 2.82 TFLOP) at 23.84 ms == 118 effective
TFLOPs, ABOVE that ceiling. One of the two is wrong, and every
roofline verdict in BASELINE.md depends on which. r3 already proved the
r2 HBM ceiling was low (389 -> 598.8 GB/s measured); this probe settles
the matmul side the same way.

Every chain here threads the loop-carried value through the NEXT
iteration's *operand values* (a = f(a @ b)), so no algebraic
simplification, CSE, or loop-invariant code motion can hoist the body
— unlike the `x + 0.0*acc` perturbation, which relies on XLA not
folding float 0*x. Scalar readback stops the clock (block_until_ready
does not block through the relay).

Modes (CP_MODE):
  matmul         bf16 n^3 chains, n in {2048, 4096, 8192}
  matmul_f32acc  same with preferred_element_type=f32 + cast back
                 (the r2 probe's likely shape)
  int8           s8 x s8 -> s32 chains, low-byte feedback
  conv           3x3x512x512 bf16 conv chain @ (8,96,96,512)
  backbone       resnet101 OS8 @1024x2048 b1 eval forward, input-chained
                 (cross-checks tools/attn_map.py's param-perturb number)

Reference: SURVEY.md section 6 perf baselines; BASELINE.md r2 roofline.
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
    print(f"[ceiling +{time.time() - T0:8.1f}s] {msg}", file=sys.stderr, flush=True)


def wait_for_backend():
    for _ in range(30):
        try:
            return jax.default_backend()
        except RuntimeError as e:
            log(f"backend unavailable ({e}); retry in 60s")
            time.sleep(60)
    raise RuntimeError("backend never came up")


def _target():
    return float(os.environ.get("CP_TARGET", 4e12))


def _time_chain(run, args, iters):
    """warm (compiles), then time `iters` chained iterations."""
    warm = float(np.asarray(run(*args, 1)))
    assert np.isfinite(warm), warm
    t0 = time.perf_counter()
    out = float(np.asarray(run(*args, iters)))
    dt = time.perf_counter() - t0
    assert np.isfinite(out), out
    return dt / iters


def matmul_chain(f32acc: bool):
    results = {}
    for n in (2048, 4096, 8192):
        rs = np.random.RandomState(0)
        a = jnp.asarray(rs.randn(n, n), jnp.bfloat16)
        b = jnp.asarray(rs.randn(n, n), jnp.bfloat16)
        scale = jnp.bfloat16(1.0 / np.sqrt(n))

        @jax.jit
        def run(a, b, iters, _f32=f32acc):
            def body(i, aa):
                if _f32:
                    c = jax.lax.dot(aa, b, preferred_element_type=jnp.float32)
                    return (c * scale.astype(jnp.float32)).astype(jnp.bfloat16)
                return jax.lax.dot(aa, b) * scale

            out = jax.lax.fori_loop(0, iters, body, a)
            return out[0, 0].astype(jnp.float32)

        iters = max(2, int(_target() / (2 * n**3)))
        sec = _time_chain(run, (a, b), iters)
        tflops = 2 * n**3 / sec / 1e12
        results[n] = round(tflops, 1)
        log(f"n={n}: {sec*1e6:.0f} us/iter = {tflops:.1f} TFLOPs")
    print(
        json.dumps(
            {"tool": "ceiling", "mode": "matmul_f32acc" if f32acc else "matmul",
             "tflops": results}
        ),
        flush=True,
    )


def matmul_rect():
    """Conv-shaped rectangular dots: is the 49-TF conv ceiling the MXU's
    shape behavior or XLA's conv lowering? (M,K,N) cases:
    - (73728, 4608, 512): the ceil_conv 3x3x512x512 im2col equivalent
    - (73728, 512, 512): its pointwise counterpart
    - (18432, 728, 728): flagship middle-flow pointwise
    - (18432, 6552, 728): middle-flow 3x3 if it were im2col
    """
    results = {}
    for m, k, n in (
        (73728, 4608, 512),
        (73728, 512, 512),
        (18432, 728, 728),
        (18432, 6552, 728),
    ):
        rs = np.random.RandomState(0)
        a = jnp.asarray(rs.randn(m, k), jnp.bfloat16)
        b = jnp.asarray(rs.randn(k, n), jnp.bfloat16)
        scale = jnp.bfloat16(1.0 / np.sqrt(k))

        @jax.jit
        def run(a, b, iters):
            def body(i, bb):
                c = jax.lax.dot(a, bb) * scale
                # mean keeps every element of c live (no dead-code
                # slicing of the dot); feeding it back through the
                # small operand keeps chain traffic negligible
                return bb + c.mean().astype(bb.dtype) * jnp.bfloat16(1e-30)

            out = jax.lax.fori_loop(0, iters, body, b)
            return out[0, 0].astype(jnp.float32)

        flop = 2 * m * k * n
        iters = max(2, int(_target() / flop))
        sec = _time_chain(run, (a, b), iters)
        tflops = flop / sec / 1e12
        results[f"{m}x{k}x{n}"] = round(tflops, 1)
        log(f"{m}x{k}x{n}: {sec*1e6:.0f} us/iter = {tflops:.1f} TFLOPs")
    print(
        json.dumps({"tool": "ceiling", "mode": "matmul_rect", "tflops": results}),
        flush=True,
    )


def int8_rect():
    """int8 dots at the framework's real pointwise shapes — at 188 TOPS
    square the int8 pw path's 62-TOPS r2 measurement may be shape-bound
    the same way bf16 is."""
    results = {}
    for m, k, n in (
        (18432, 728, 728),
        (73728, 512, 512),
        (18432, 1536, 1536),
    ):
        rs = np.random.RandomState(0)
        a = jnp.asarray(rs.randint(-127, 127, (m, k)), jnp.int8)
        b = jnp.asarray(rs.randint(-127, 127, (k, n)), jnp.int8)

        @jax.jit
        def run(a, b, iters):
            def body(i, bb):
                c = jax.lax.dot(a, bb, preferred_element_type=jnp.int32)
                s = (c.sum() & 1).astype(jnp.int8)
                return bb + s  # true dependence, all elements live

            out = jax.lax.fori_loop(0, iters, body, b)
            return out[0, 0].astype(jnp.float32)

        flop = 2 * m * k * n
        iters = max(2, int(_target() / flop))
        sec = _time_chain(run, (a, b), iters)
        tops = flop / sec / 1e12
        results[f"{m}x{k}x{n}"] = round(tops, 1)
        log(f"{m}x{k}x{n}: {sec*1e6:.0f} us/iter = {tops:.1f} TOPS")
    print(
        json.dumps({"tool": "ceiling", "mode": "int8_rect", "tops": results}),
        flush=True,
    )


def pw_conv_vs_dot():
    """Same 1x1 conv computed via conv_general_dilated vs reshape+dot,
    bf16 and int8, at the flagship middle-flow shape (1,64,128,728) —
    if the dot path is faster, qconv/pointwise get a reshape fast path."""
    results = {}
    n, h, w_, c = 1, 64, 128, 728
    rs = np.random.RandomState(0)
    flop = 2 * n * h * w_ * c * c
    for dtype, acc_t in ((jnp.bfloat16, None), (jnp.int8, jnp.int32)):
        if dtype == jnp.int8:
            x = jnp.asarray(rs.randint(-127, 127, (n, h, w_, c)), dtype)
            k = jnp.asarray(rs.randint(-127, 127, (1, 1, c, c)), dtype)
        else:
            x = jnp.asarray(rs.randn(n, h, w_, c), dtype)
            k = jnp.asarray(rs.randn(1, 1, c, c) * 0.03, dtype)

        @jax.jit
        def run_conv(x, k, iters, _acc=acc_t, _dt=dtype):
            def body(i, kk):
                y = jax.lax.conv_general_dilated(
                    x, kk, (1, 1), [(0, 0), (0, 0)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    **({"preferred_element_type": _acc} if _acc else {}),
                )
                if _dt == jnp.int8:
                    s = (y.sum() & 1).astype(_dt)
                else:
                    s = y.mean().astype(_dt) * jnp.asarray(1e-30, _dt)
                return kk + s

            out = jax.lax.fori_loop(0, iters, body, k)
            return out[0, 0, 0, 0].astype(jnp.float32)

        @jax.jit
        def run_dot(x, k, iters, _acc=acc_t, _dt=dtype):
            x2 = x.reshape(n * h * w_, c)

            def body(i, kk):
                y = jax.lax.dot(
                    x2, kk.reshape(c, c),
                    **({"preferred_element_type": _acc} if _acc else {}),
                )
                if _dt == jnp.int8:
                    s = (y.sum() & 1).astype(_dt)
                else:
                    s = y.mean().astype(_dt) * jnp.asarray(1e-30, _dt)
                return kk + s

            out = jax.lax.fori_loop(0, iters, body, k)
            return out[0, 0, 0, 0].astype(jnp.float32)

        iters = max(2, int(_target() / flop))
        for name, fn in (("conv", run_conv), ("dot", run_dot)):
            sec = _time_chain(fn, (x, k), iters)
            eff = flop / sec / 1e12
            key = f"{np.dtype(dtype).name}_{name}"
            results[key] = {"us": round(sec * 1e6, 1), "tops": round(eff, 1)}
            log(f"{key}: {sec*1e6:.1f} us = {eff:.1f} T")
    print(
        json.dumps({"tool": "ceiling", "mode": "pw_conv_vs_dot", "r": results}),
        flush=True,
    )


def pallas_dot():
    """Minimal Mosaic matmul at the middle-flow pointwise shape: can a
    pallas kernel reach the MXU's int8/bf16 rate at M=8192, K=N=728
    (and at the 768-padded variant)? De-risks the fused middle-flow
    kernel plan before building it."""
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    results = {}
    m = 8192
    bm = 1024
    for dtype_name, c in (
        ("int8", 728), ("int8", 768), ("bf16", 728), ("bf16", 768),
    ):
        dtype = jnp.int8 if dtype_name == "int8" else jnp.bfloat16
        rs = np.random.RandomState(0)
        if dtype == jnp.int8:
            x = jnp.asarray(rs.randint(-127, 127, (m, c)), dtype)
            w = jnp.asarray(rs.randint(-8, 8, (c, c)), dtype)
        else:
            x = jnp.asarray(rs.randn(m, c), dtype)
            w = jnp.asarray(rs.randn(c, c) * 0.03, dtype)

        def kern(x_ref, w_ref, o_ref, _dt=dtype):
            acc = jax.lax.dot_general(
                x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32
                if _dt == jnp.int8 else jnp.float32,
            )
            if _dt == jnp.int8:
                o_ref[...] = (acc >> 7).astype(jnp.int8)
            else:
                o_ref[...] = acc.astype(jnp.bfloat16)

        call = pl.pallas_call(
            kern,
            grid=(m // bm,),
            in_specs=[
                pl.BlockSpec((bm, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, c), dtype),
        )

        @jax.jit
        def run(x, w, iters, _call=call, _dt=dtype):
            def body(i, ww):
                o = _call(x, ww)
                if _dt == jnp.int8:
                    s = (o.astype(jnp.int32).sum() & 1).astype(_dt)
                else:
                    s = o.mean().astype(_dt) * jnp.asarray(1e-30, _dt)
                return ww + s

            out = jax.lax.fori_loop(0, iters, body, w)
            return out[0, 0].astype(jnp.float32)

        flop = 2 * m * c * c
        iters = max(2, int(_target() / flop))
        try:
            sec = _time_chain(run, (x, w), iters)
            eff = flop / sec / 1e12
            results[f"{dtype_name}_{c}"] = {
                "us": round(sec * 1e6, 1), "tops": round(eff, 1)
            }
            log(f"{dtype_name} c={c}: {sec*1e6:.1f} us = {eff:.1f} T")
        except Exception as e:
            results[f"{dtype_name}_{c}"] = f"fail: {type(e).__name__}"
            log(f"{dtype_name} c={c}: FAILED {e}")
    print(
        json.dumps({"tool": "ceiling", "mode": "pallas_dot", "r": results}),
        flush=True,
    )


def int8_chain():
    results = {}
    for n in (2048, 4096, 8192):
        rs = np.random.RandomState(0)
        a = jnp.asarray(rs.randint(-127, 127, (n, n)), jnp.int8)
        b = jnp.asarray(rs.randint(-127, 127, (n, n)), jnp.int8)

        @jax.jit
        def run(a, b, iters):
            def body(i, aa):
                c = jax.lax.dot(aa, b, preferred_element_type=jnp.int32)
                # low-byte feedback keeps true dependence, bounded values
                return (c & 127).astype(jnp.int8)

            out = jax.lax.fori_loop(0, iters, body, a)
            return out[0, 0].astype(jnp.float32)

        iters = max(2, int(_target() / (2 * n**3)))
        sec = _time_chain(run, (a, b), iters)
        tops = 2 * n**3 / sec / 1e12
        results[n] = round(tops, 1)
        log(f"n={n}: {sec*1e6:.0f} us/iter = {tops:.1f} TOPS")
    print(json.dumps({"tool": "ceiling", "mode": "int8", "tops": results}), flush=True)


def conv_chain():
    """3x3 bf16 conv chains across shapes. The original (8,96,96,512)
    measured 49 TF while the resnet101-OS8 backbone runs ~118 eff TF
    in-context with XLA convs — sweep W (tiling multiples), batch and C
    to find what the conv lowering actually keys on."""
    results = {}
    shapes = (
        (8, 96, 96, 512),    # original probe: W not a 128 multiple
        (1, 128, 256, 512),  # resnet-like OS8 full-res geometry
        (8, 128, 128, 512),  # batch + aligned W
        (1, 64, 128, 728),   # middle-flow geometry, dense
    )
    if os.environ.get("CP_CONV_SHAPES"):
        # e.g. "1x256x512x48,1x128x256x96" — the HRNet branch widths
        # (lane-utilization hypothesis for the 37-TF backbone, r5)
        shapes = tuple(
            tuple(int(v) for v in s.split("x"))
            for s in os.environ["CP_CONV_SHAPES"].split(",")
        )
    for shape in shapes:
        n, h, w_, c = shape
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(*shape), jnp.bfloat16)
        w = jnp.asarray(rs.randn(3, 3, c, c) * 0.02, jnp.bfloat16)

        @jax.jit
        def run(x, w, iters):
            def body(i, xx):
                y = jax.lax.conv_general_dilated(
                    xx, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                return y * jnp.bfloat16(1.0 / 68.0)

            out = jax.lax.fori_loop(0, iters, body, x)
            return out[0, 0, 0, 0].astype(jnp.float32)

        flop = 2 * n * h * w_ * c * c * 9
        iters = max(2, int(_target() / flop))
        sec = _time_chain(run, (x, w), iters)
        tflops = flop / sec / 1e12
        results["x".join(map(str, shape))] = round(tflops, 1)
        log(f"conv3x3 @{shape}: {sec*1e3:.2f} ms/iter = {tflops:.1f} TFLOPs")
    print(
        json.dumps({"tool": "ceiling", "mode": "conv", "tflops": results}),
        flush=True,
    )


def backbone_chain():
    """resnet101 OS8 @1024x2048 b1, input-carried TRUE dependence.

    Pallas-free graph, so input-carried is the serving-faithful harness
    (BASELINE.md "Harness correction"); the 1e-30 feedback is a real
    data dependence that bf16 addition rounds away (no numeric drift).
    """
    from segmentron_tpu.config import cfg
    from segmentron_tpu.models.backbones import get_segmentation_backbone
    from segmentron_tpu.modules.batch_norm import norm_from_cfg
    from segmentron_tpu.utils.compileopts import tpu_compiler_options

    cfg.defrost()
    cfg.MODEL.BACKBONE = "resnet101"
    cfg.MODEL.OUTPUT_STRIDE = 8
    cfg.TRAIN.SYNC_BATCH_NORM = False

    module = get_segmentation_backbone("resnet101", norm_from_cfg(cfg))
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
    x = jax.device_put(jnp.zeros((1, 1024, 2048, 3), jnp.bfloat16), dev)

    @functools.partial(jax.jit, compiler_options=tpu_compiler_options())
    def run(v, x, iters):
        def body(i, xx):
            out = module.apply(v, xx, False)[-1]
            eps = out.mean().astype(jnp.bfloat16) * jnp.bfloat16(1e-30)
            return xx + eps

        out = jax.lax.fori_loop(0, iters, body, x)
        return out[0, 0, 0, 0].astype(jnp.float32)

    iters = int(os.environ.get("CP_ITERS", 20))
    log("compiling backbone chain (remote compile may take minutes)")
    sec = _time_chain(run, (variables, x), iters)
    log(f"backbone chain: {sec*1e3:.2f} ms/iter")
    print(
        json.dumps(
            {"tool": "ceiling", "mode": "backbone", "h": 1024, "w": 2048,
             "ms_per_iter": round(sec * 1e3, 2),
             "img_per_s": round(1.0 / sec, 2)}
        ),
        flush=True,
    )


def bnstats():
    """BN-train stat+normalize cost vs channel count at CONSTANT
    element count — the lane-waste hypothesis test (profile r4: entry
    tensors at C=32/64 are laid out with C on the 128-lane axis, so
    every stats/elementwise op should waste 75%/50% of the VPU; if
    measured cost is ~flat in C, the hypothesis is wrong and the
    blocked-layout entry plan dies before any surgery)."""
    results = {}
    n, h = 8, 256
    wc = 32768  # w*c per row — 67M elements, 134 MB bf16
    for c in (32, 64, 128, 256):
        w_ = wc // c
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(n, h, w_, c), jnp.bfloat16)
        g = jnp.asarray(rs.rand(c) + 0.5, jnp.float32)
        b = jnp.asarray(rs.randn(c), jnp.float32)

        @jax.jit
        def run(x, g, b, iters):
            def body(i, xx):
                xf = xx.astype(jnp.float32)
                mean = xf.mean(axis=(0, 1, 2))
                var = (xf * xf).mean(axis=(0, 1, 2)) - mean * mean
                y = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * g + b
                y = jnp.maximum(y, 0.0).astype(jnp.bfloat16)
                return xx + y.mean().astype(jnp.bfloat16) * jnp.bfloat16(
                    1e-30
                )

            out = jax.lax.fori_loop(0, iters, body, x)
            return out[0, 0, 0, 0].astype(jnp.float32)

        iters = 50
        sec = _time_chain(run, (x, g, b), iters)
        results[c] = round(sec * 1e3, 3)
        log(f"C={c} (shape {n}x{h}x{w_}x{c}): {sec*1e3:.3f} ms/iter")
    print(
        json.dumps({"tool": "ceiling", "mode": "bnstats", "ms": results}),
        flush=True,
    )


def dwred():
    """dW-reduction (x^T @ dy, K=big spatial) cost vs channel widths at
    constant FLOPs — the other train-tax slice from the r4 profile
    (f32[1,1,128,128] dW fusions at 1.2 ms for 9.7 GFLOP = 8 eff TF).
    If folding spatial into channels (K/2, 2*Cin, same Cout) speeds the
    contraction, the blocked-layout entry also fixes dW."""
    results = {}
    for k, ci, co in (
        (294912, 64, 128),   # block1 pw dW as-is
        (147456, 128, 128),  # W-folded: half K, double Cin
        (294912, 128, 128),  # 2x FLOPs control at full width
        (294912, 32, 64),    # stem-conv2-like
    ):
        rs = np.random.RandomState(0)
        xa = jnp.asarray(rs.randn(k, ci), jnp.bfloat16)
        dy = jnp.asarray(rs.randn(k, co), jnp.bfloat16)

        @jax.jit
        def run(xa, dy, iters):
            def body(i, dyy):
                dw = jax.lax.dot_general(
                    xa, dyy, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return dyy + dw.mean().astype(dyy.dtype) * jnp.bfloat16(
                    1e-30
                )

            out = jax.lax.fori_loop(0, iters, body, dy)
            return out[0, 0].astype(jnp.float32)

        flop = 2 * k * ci * co
        iters = 100
        sec = _time_chain(run, (xa, dy), iters)
        eff = flop / sec / 1e12
        results[f"{k}x{ci}x{co}"] = {
            "us": round(sec * 1e6, 1), "tflops": round(eff, 1)
        }
        log(f"K={k} Cin={ci} Cout={co}: {sec*1e6:.1f} us = {eff:.1f} TF")
    print(
        json.dumps({"tool": "ceiling", "mode": "dwred", "r": results}),
        flush=True,
    )


def flagship_chain():
    """Flagship inference (DeepLabv3+/Xception-65 @1024x2048 b1, bench
    defaults: int8-pw + fused stem+block1 pallas entry), input-chained
    TRUE dependence — cross-checks bench.py's param-perturb harness on
    a PALLAS-BEARING graph (ceil_backbone only validated it pallas-free).
    Caveat: input-chaining a pallas graph costs a known relayout copy
    per iteration (BASELINE.md r2 "Harness correction"), so this is an
    UPPER bound on the true per-iter time; bench must be within
    [this - relayout, this]."""
    from segmentron_tpu.config import cfg
    from segmentron_tpu.models import get_segmentation_model
    from segmentron_tpu.utils.compileopts import tpu_compiler_options

    cfg.defrost()
    cfg.DATASET.NAME = "cityscapes"
    cfg.MODEL.MODEL_NAME = "DeepLabV3_Plus"
    cfg.MODEL.BACKBONE = "xception65"
    cfg.MODEL.OUTPUT_STRIDE = 16
    cfg.SOLVER.AUX = False
    cfg.TRAIN.SYNC_BATCH_NORM = False

    module = get_segmentation_model()
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
    x = jax.device_put(jnp.zeros((1, 1024, 2048, 3), jnp.bfloat16), dev)

    @functools.partial(jax.jit, compiler_options=tpu_compiler_options())
    def run(v, x, iters):
        def body(i, xx):
            out = module.apply(v, xx, False)[0]
            eps = out.mean().astype(jnp.bfloat16) * jnp.bfloat16(1e-30)
            return xx + eps

        out = jax.lax.fori_loop(0, iters, body, x)
        return out[0, 0, 0, 0].astype(jnp.float32)

    iters = int(os.environ.get("CP_ITERS", 30))
    log("compiling flagship chain (remote compile may take many minutes)")
    sec = _time_chain(run, (variables, x), iters)
    log(f"flagship chain: {sec*1e3:.2f} ms/iter")
    print(
        json.dumps(
            {"tool": "ceiling", "mode": "flagship", "h": 1024, "w": 2048,
             "ms_per_iter": round(sec * 1e3, 2),
             "img_per_s": round(1.0 / sec, 2)}
        ),
        flush=True,
    )


def main():
    wait_for_backend()
    mode = os.environ.get("CP_MODE", "matmul")
    if mode == "matmul":
        matmul_chain(False)
    elif mode == "matmul_f32acc":
        matmul_chain(True)
    elif mode == "matmul_rect":
        matmul_rect()
    elif mode == "int8":
        int8_chain()
    elif mode == "int8_rect":
        int8_rect()
    elif mode == "pw_conv_vs_dot":
        pw_conv_vs_dot()
    elif mode == "pallas_dot":
        pallas_dot()
    elif mode == "conv":
        conv_chain()
    elif mode == "backbone":
        backbone_chain()
    elif mode == "flagship":
        flagship_chain()
    elif mode == "bnstats":
        bnstats()
    elif mode == "dwred":
        dwred()
    else:
        raise SystemExit(f"unknown CP_MODE={mode}")


if __name__ == "__main__":
    main()
