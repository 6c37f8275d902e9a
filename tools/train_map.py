"""Train-step component map on the real chip (VERDICT r3 next-round #1).

The inference side got a per-part component map (BASELINE.md r2) that
exposed where the slack was; this tool does the same for the TRAINING
step: flagship config #3 (DeepLabv3+/Xception-65, 768^2 crops, batch 8,
bf16 compute, SGD+poly) decomposed by model prefix and by graph mode.

One measurement per invocation (each fresh graph is a multi-minute
remote compile through the relay; the persistent cache under
.jax_cache/ makes re-runs instant), selected by MAP_MODE:

  full          production train step (== BENCH_MODE=train bench.py)
  fwd           train-mode forward + CE loss only (no grad/update)
  fwd_eval      eval-mode forward + CE (BN running stats; the delta vs
                `fwd` is the train-BN statistics chain, forward only)
  part_stem     conv1+conv2 only (stride 2) + 1x1 classifier
  part_block1   stem + block1 (stride 4)
  part_block2   stem + block1 + block2 (stride 8)
  part_entry    train step of the Xception ENTRY flow (stem..block3,
                stride 16) + 1x1 classifier, CE at stride 16
  part_middle   entry + 16 middle blocks
  part_backbone full backbone (entry+middle+exit)
  part_aspp     backbone + ASPP, classifier + CE at stride 16
  part_decoder  backbone + ASPP + c1-proj/concat/decoder sepconvs,
                classifier + CE at stride 4 (everything but the final
                x4 logits resize + full-res CE: that slice = full -
                part_decoder)

  part_null     1x1 stride-2 conv classifier directly on the input +
                CE at stride 2 — measures the HARNESS FLOOR (casts,
                state plumbing, CE at the stem's pixel count, update
                machinery) that every part_* number includes

Composable env knobs (apply to any mode): MAP_FWDONLY=1 times the
train-mode forward+loss only (no grad/update — per-part fwd/bwd
split); MAP_BN=frozen forces FrozenBN (per-part BN-training cost);
MAP_WBLOCK=0 disables the W-blocked stem conv (its backward has never
been measured in isolation); MAP_NOCE=1 replaces the CE loss with a
logits-mean (isolates the loss pipeline); MAP_NOUPDATE=1 stops after
grads (sum of squared leaves readback; isolates optimizer+state I/O).
  frozen        full model, FrozenBN everywhere (the delta vs `full`
                is the whole BN-training cost: stats fwd + stats bwd)
  remat_dots    full step, jax.checkpoint dots policy
  remat_full    full step, full remat

Part deltas give per-stage fwd+bwd+update cost:
  entry = T(part_entry); middle = T(part_middle) - T(part_entry);
  exit = T(part_backbone) - T(part_middle);
  head(ASPP+decoder+resize+fullres loss) = T(full) - T(part_backbone).

Methodology identical to bench.py (fori_loop inside ONE jitted program,
scalar readback stops the clock; the relay's block_until_ready is a
no-op). Env knobs: MAP_CROP (768), MAP_BATCH (8), MAP_ITERS (10).
Appends one JSON line per run to stdout.
"""

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
    print(f"[map +{time.time() - T0:8.1f}s] {msg}", file=sys.stderr, flush=True)


def build_prefix_model(stages: str, nclass: int = 19):
    """Truncated Xception-65 (OS16 geometry) + 1x1 classifier.

    Mirrors backbones/xception.py::Xception65 block-for-block so the
    per-stage train cost is the real one; the classifier head keeps the
    loss shape tiny (stride-16 logits) and identical across parts.
    """
    import flax.linen as nn

    from segmentron_tpu.config import cfg
    from segmentron_tpu.models.backbones.xception import XceptionBlock
    from segmentron_tpu.modules.basic import ConvBNReLU, SeparableConv2d, conv2d
    from segmentron_tpu.modules.batch_norm import norm_from_cfg

    norm = norm_from_cfg(cfg)

    full_backbone = stages in ("backbone", "aspp", "decoder")

    class XNull(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            return (conv2d(nclass, 1, 2, 0, name="classifier")(x),)

    if stages == "null":
        return XNull()

    class XPrefix(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = True):
            x = ConvBNReLU(32, 3, 2, norm=norm, name="conv1")(x, train)
            x = ConvBNReLU(64, 3, 1, norm=norm, name="conv2")(x, train)
            if stages != "stem":
                x = XceptionBlock(
                    (128, 128, 128), 2, norm=norm, relu_first=False,
                    name="block1",
                )(x, train)
            c1 = x
            if stages not in ("stem", "block1"):
                x = XceptionBlock((256, 256, 256), 2, norm=norm, name="block2")(
                    x, train
                )
            if stages not in ("stem", "block1", "block2"):
                x = XceptionBlock((728, 728, 728), 2, norm=norm, name="block3")(
                    x, train
                )
            if stages in ("middle", "backbone", "aspp", "decoder"):
                for i in range(16):
                    x = XceptionBlock(
                        (728, 728, 728), 1, skip_type="sum", norm=norm,
                        name=f"middle{i + 1}",
                    )(x, train)
            if full_backbone:
                x = XceptionBlock(
                    (728, 1024, 1024), 1, dilation=1, norm=norm, name="exit1"
                )(x, train)
                for i, ch in enumerate((1536, 1536, 2048)):
                    x = SeparableConv2d(
                        ch, 3, dilation=2, norm=norm, relu_first=False,
                        name=f"exit_sep{i + 1}",
                    )(x, train)
                    x = nn.relu(x)
            if stages in ("aspp", "decoder"):
                from segmentron_tpu.modules import ASPP
                from segmentron_tpu.ops import resize_bilinear

                x = ASPP(
                    out_channels=256, atrous_rates=(6, 12, 18),
                    separable=True, norm=norm, name="head",
                )(x, train)
            if stages == "decoder":
                import jax.numpy as jnp

                low = ConvBNReLU(48, 1, padding=0, norm=norm, name="c1_proj")(
                    c1, train
                )
                x = resize_bilinear(x, low.shape[1:3], align_corners=True)
                x = jnp.concatenate([x, low], axis=-1)
                for i in range(2):
                    x = SeparableConv2d(
                        256, 3, norm=norm, relu_first=False, name=f"decoder{i}",
                    )(x, train)
                    x = nn.relu(x)
            x = conv2d(nclass, 1, 1, 0, name="classifier")(x)
            return (x,)

    return XPrefix()


def main():
    from jax.sharding import Mesh, PartitionSpec as P

    from segmentron_tpu.config import cfg
    from segmentron_tpu.engine.steps import TrainState, make_train_step
    from segmentron_tpu.models import get_segmentation_model
    from segmentron_tpu.solver import (
        get_lr_scheduler,
        get_optimizer,
        get_segmentation_loss,
    )
    from segmentron_tpu.solver.loss import cross_entropy
    from segmentron_tpu.utils.compileopts import tpu_compiler_options

    mode = os.environ.get("MAP_MODE", "full")
    crop = int(os.environ.get("MAP_CROP", 768))
    batch = int(os.environ.get("MAP_BATCH", 8))
    iters = int(os.environ.get("MAP_ITERS", 10))

    cfg.defrost()
    cfg.DATASET.NAME = "cityscapes"
    cfg.MODEL.MODEL_NAME = "DeepLabV3_Plus"
    cfg.MODEL.BACKBONE = "xception65"
    cfg.MODEL.OUTPUT_STRIDE = 16
    cfg.SOLVER.AUX = False
    cfg.TRAIN.SYNC_BATCH_NORM = True
    if mode == "frozen" or os.environ.get("MAP_BN", "") == "frozen":
        cfg.MODEL.BN_TYPE = "FrozenBN"
    if mode == "remat_dots":
        cfg.TPU.REMAT = "dots"
    elif mode == "remat_full":
        cfg.TPU.REMAT = "full"
    if os.environ.get("MAP_WBLOCK", "1") == "0":
        cfg.TPU.STEM_WBLOCK = False

    # backend must be up BEFORE model construction (norm downgrade
    # reads jax.device_count(); see bench.py)
    backend = None
    for _ in range(30):
        try:
            backend = jax.default_backend()
            break
        except RuntimeError as e:
            log(f"backend unavailable ({e}); retry in 60s")
            time.sleep(60)
    on_tpu = backend not in (None, "cpu")
    half = jnp.bfloat16 if on_tpu else jnp.float32

    if mode.startswith("part_"):
        part = mode.split("_", 1)[1]
        model = build_prefix_model(part)
        s = {"null": 2, "stem": 2, "block1": 4, "block2": 8, "decoder": 4}.get(
            part, 16
        )

        def criterion(outputs, masks):
            return cross_entropy(outputs[0], masks[:, ::s, ::s])

    else:
        model = get_segmentation_model()
        criterion = get_segmentation_loss(
            cfg.MODEL.MODEL_NAME,
            use_ohem=cfg.SOLVER.OHEM,
            aux=cfg.SOLVER.AUX,
            aux_weight=cfg.SOLVER.AUX_WEIGHT,
            loss_name=cfg.SOLVER.LOSS_NAME,
        )

    if os.environ.get("MAP_NOCE", "0") == "1":
        def criterion(outputs, masks):  # noqa: F811
            return jnp.mean(outputs[0]).astype(jnp.float32)

    log(f"mode={mode} crop={crop} batch={batch}; init on CPU")
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3), jnp.float32)
        )
        tx = get_optimizer(cfg, variables["params"], get_lr_scheduler(cfg, 100))
        state = TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            rng=jax.random.PRNGKey(1),
        )
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    images = jax.device_put(jnp.full((batch, crop, crop, 3), 0.1, jnp.float32), dev)
    masks = jax.device_put(jnp.zeros((batch, crop, crop), jnp.int32), dev)

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))

    fwdonly = os.environ.get("MAP_FWDONLY", "0") == "1"
    noupdate = os.environ.get("MAP_NOUPDATE", "0") == "1"
    if noupdate and not fwdonly and os.environ.get("MAP_COST", "0") != "1":
        # fwd+bwd, NO optimizer/state update: isolates the
        # optimizer+state-I/O slice. Chained via a true (1e-30-scaled)
        # perturbation of the stem kernel — not a foldable 0*acc.
        from segmentron_tpu.engine.steps import _cast_floats

        def gloss(params, batch_stats, imgs, msks, rng):
            p = _cast_floats(params, half)
            out, _ = model.apply(
                {"params": p, "batch_stats": batch_stats},
                imgs.astype(half), True,
                mutable=["batch_stats"], rngs={"dropout": rng},
            )
            return criterion(out, msks)

        def run(st, imgs, msks, n):
            def body(i, acc):
                params = jax.tree_util.tree_map(lambda a: a, st.params)
                node = params
                path = (
                    ("classifier", "kernel")
                    if mode == "part_null"
                    else ("conv1", "conv", "kernel")
                    if mode.startswith("part_")
                    else ("backbone", "conv1", "conv", "kernel")
                )
                for k in path[:-1]:
                    node = node[k]
                node[path[-1]] = node[path[-1]] + (1e-30 * acc).astype(
                    node[path[-1]].dtype
                )
                g = jax.grad(gloss)(
                    params, st.batch_stats, imgs, msks, st.rng
                )
                sq = sum(
                    jnp.sum(jnp.square(x.astype(jnp.float32)))
                    for x in jax.tree_util.tree_leaves(g)
                )
                return acc + sq

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        timed = jax.jit(
            jax.shard_map(
                run, mesh=mesh, in_specs=(P(), P("data"), P("data"), P()),
                out_specs=P(), check_vma=False,
            ),
            compiler_options=tpu_compiler_options(),
        )
        log("compiling (remote compile may take many minutes)")
        v0 = float(np.asarray(timed(state, images, masks, 1)))
        assert np.isfinite(v0), v0
        log(f"compiled (warm gradsq {v0:.4f}); timing")
        t0 = time.perf_counter()
        v1 = float(np.asarray(timed(state, images, masks, iters)))
        dt = time.perf_counter() - t0
        assert np.isfinite(v1), v1
        ms = dt / iters * 1000.0
        print(
            json.dumps(
                {
                    "tool": "train_map", "mode": mode, "noupdate": True,
                    "bn": str(cfg.MODEL.BN_TYPE), "crop": crop,
                    "batch": batch, "iters": iters,
                    "ms_per_step": round(ms, 2),
                    "img_per_s": round(iters * batch / dt, 2),
                }
            ),
            flush=True,
        )
        return
    if os.environ.get("MAP_COST", "0") == "1":
        # Host-side XLA cost analysis of ONE step (run with
        # JAX_PLATFORMS=cpu): per-part FLOP counts for roofline floors.
        # Bytes-accessed is NOT printed — r3 proved it grossly
        # overcounts HBM traffic (BASELINE.md HRNet pass).
        step = make_train_step(
            model, criterion, tx, mesh, compute_dtype=half,
            remat=str(cfg.TPU.REMAT),
        )

        def one(st, imgs, msks):
            if fwdonly:
                from segmentron_tpu.engine.steps import _cast_floats

                p = _cast_floats(st.params, half)
                out, _ = model.apply(
                    {"params": p, "batch_stats": st.batch_stats},
                    imgs.astype(half), True,
                    mutable=["batch_stats"], rngs={"dropout": st.rng},
                )
                return criterion(out, msks)
            return step.raw(st, imgs, msks)[1]

        lowered = jax.jit(
            jax.shard_map(
                one, mesh=mesh, in_specs=(P(), P("data"), P("data")),
                out_specs=P(), check_vma=False,
            )
        ).lower(state, images, masks)
        ca = lowered.compile().cost_analysis()
        print(
            json.dumps(
                {
                    "tool": "train_map",
                    "mode": mode,
                    "fwdonly": fwdonly,
                    "cost": True,
                    "crop": crop,
                    "batch": batch,
                    "gflop": round(float(ca.get("flops", 0.0)) / 1e9, 1),
                }
            ),
            flush=True,
        )
        return
    if mode in ("fwd", "fwd_eval") or fwdonly:
        train_flag = mode != "fwd_eval"

        def fwd_loss(params, batch_stats, imgs, msks, rng):
            from segmentron_tpu.engine.steps import _cast_floats

            p = _cast_floats(params, half)
            if train_flag:
                out, _ = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    imgs.astype(half), True,
                    mutable=["batch_stats"], rngs={"dropout": rng},
                )
            else:
                out = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    imgs.astype(half), False,
                )
            return criterion(out, msks)

        def run(st, imgs, msks, n):
            # anti-hoisting: perturb the stem conv1 kernel by 0*acc each
            # iteration (param-carried; see bench.py harness notes)
            def body(i, acc):
                params = jax.tree_util.tree_map(lambda a: a, st.params)
                node = params
                path = (
                    ("classifier", "kernel")
                    if mode == "part_null"
                    else ("conv1", "conv", "kernel")
                    if mode.startswith("part_")
                    else ("backbone", "conv1", "conv", "kernel")
                )
                for k in path[:-1]:
                    node = node[k]
                node[path[-1]] = node[path[-1]] + (0.0 * acc).astype(
                    node[path[-1]].dtype
                )
                return acc + fwd_loss(
                    params, st.batch_stats, imgs, msks, st.rng
                ).astype(jnp.float32)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        timed = jax.jit(
            jax.shard_map(
                run, mesh=mesh, in_specs=(P(), P("data"), P("data"), P()),
                out_specs=P(), check_vma=False,
            ),
            compiler_options=tpu_compiler_options(),
        )

        log("compiling (remote compile may take many minutes)")
        v0 = float(np.asarray(timed(state, images, masks, 1)))
        assert np.isfinite(v0), v0
        log(f"compiled (warm loss {v0:.4f}); timing")
        t0 = time.perf_counter()
        v1 = float(np.asarray(timed(state, images, masks, iters)))
        dt = time.perf_counter() - t0
        assert np.isfinite(v1), v1
    else:
        step = make_train_step(
            model, criterion, tx, mesh, compute_dtype=half,
            remat=str(cfg.TPU.REMAT),
        )
        raw = step.raw

        def run(st, imgs, msks, n):
            def body(i, carry):
                s2, _ = carry
                return raw(s2, imgs, msks)

            return jax.lax.fori_loop(0, n, body, (st, jnp.float32(0.0)))[1]

        timed = jax.jit(
            jax.shard_map(
                run, mesh=mesh, in_specs=(P(), P("data"), P("data"), P()),
                out_specs=P(), check_vma=False,
            ),
            compiler_options=tpu_compiler_options(),
        )
        log("compiling (remote compile may take many minutes)")
        l0 = float(np.asarray(timed(state, images, masks, 1)))
        assert np.isfinite(l0), l0
        log(f"compiled (warm loss {l0:.4f}); timing")
        t0 = time.perf_counter()
        l1 = float(np.asarray(timed(state, images, masks, iters)))
        dt = time.perf_counter() - t0
        assert np.isfinite(l1), l1

    ms = dt / iters * 1000.0
    print(
        json.dumps(
            {
                "tool": "train_map",
                "mode": mode,
                "fwdonly": fwdonly,
                "bn": str(cfg.MODEL.BN_TYPE),
                "crop": crop,
                "batch": batch,
                "iters": iters,
                "ms_per_step": round(ms, 2),
                "img_per_s": round(iters * batch / dt, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
