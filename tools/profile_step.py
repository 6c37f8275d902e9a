"""jax.profiler trace of the flagship train step + xplane top-op report.

The prefix/bisection maps (tools/train_map.py) localized the train-step
inefficiency to the entry-flow BACKWARD (~6.5 eff TF) but cannot see
inside it; this tool attempts a real device trace through the relay.
If the axon relay does not forward device profiling, the report will
contain only host planes — that outcome is recorded as the negative.

Usage: python tools/profile_step.py  (env: PROF_STEPS=3, PROF_DIR,
PROF_MODE=full|fwd — same config as train_map full mode)

Output: one JSON line with the top-N device ops by total self time,
plus the plane inventory so "no device data" is unambiguous.
"""

import glob
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
    print(f"[prof +{time.time() - T0:8.1f}s] {msg}", file=sys.stderr, flush=True)


def parse_xspace(path, top_n=60):
    """Aggregate event durations per plane from an .xplane.pb file."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    planes = {}
    for plane in space.planes:
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        agg = {}
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                d = agg.setdefault(name, [0, 0.0])
                d[0] += 1
                d[1] += ev.duration_ps / 1e9  # -> ms
        planes[plane.name] = agg
    return planes


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

    steps = int(os.environ.get("PROF_STEPS", 3))
    prof_dir = os.environ.get("PROF_DIR", "/tmp/jaxprof")
    infer = os.environ.get("PROF_MODE", "train") == "infer"
    crop = int(os.environ.get("MAP_CROP", 768))
    batch = int(os.environ.get("MAP_BATCH", 8))

    cfg.defrost()
    cfg.DATASET.NAME = "cityscapes"
    cfg.MODEL.MODEL_NAME = "DeepLabV3_Plus"
    cfg.MODEL.BACKBONE = "xception65"
    cfg.MODEL.OUTPUT_STRIDE = 16
    cfg.SOLVER.AUX = False
    cfg.TRAIN.SYNC_BATCH_NORM = not infer
    if infer:
        # bench-default serving graph: int8 pw + fused entry (defaults)
        cfg.TPU.INT8_ACTIVATIONS = "pw"

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

    model = get_segmentation_model()
    criterion = get_segmentation_loss(cfg.MODEL.MODEL_NAME)

    log("init on CPU")
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
    import shutil

    if infer:
        # serving graph @1024x2048 b1, bf16 params like bench.py
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32
            else a,
            dict(
                {"params": state.params, "batch_stats": state.batch_stats}
            ),
        )
        variables = jax.device_put(variables, dev)
        # PROF_INPUT=u8: the raw-uint8 serving entry (normalize
        # in-graph) — decomposes the measured ~3 ms/img u8-prep penalty
        # vs the pre-normalized bf16 feed (chip_results r5)
        u8_in = os.environ.get("PROF_INPUT", "") == "u8"
        x = jax.device_put(
            jnp.full((1, 1024, 2048, 3), 110, jnp.uint8)
            if u8_in else jnp.zeros((1, 1024, 2048, 3), jnp.bfloat16),
            dev,
        )

        import functools

        from segmentron_tpu.utils.compileopts import tpu_compiler_options

        @functools.partial(
            jax.jit, compiler_options=tpu_compiler_options()
        )
        def fwd(v, x):
            if x.dtype == jnp.uint8:
                from segmentron_tpu.ops.preprocess import normalize_u8

                x = normalize_u8(
                    x, list(cfg.DATASET.MEAN), list(cfg.DATASET.STD)
                ).astype(jnp.bfloat16)
            return model.apply(v, x, False)[0].mean().astype(jnp.float32)

        log("warm inference (compile)")
        v0 = float(np.asarray(fwd(variables, x)))
        log(f"warm out {v0:.4f}; tracing {steps} iters")
        shutil.rmtree(prof_dir, ignore_errors=True)
        with jax.profiler.trace(prof_dir):
            for _ in range(steps):
                lv = float(np.asarray(fwd(variables, x)))
        log(f"traced (out {lv:.4f}); parsing")
    else:
        state = jax.device_put(state, dev)
        images = jax.device_put(
            jnp.full((batch, crop, crop, 3), 0.1, jnp.float32), dev
        )
        masks = jax.device_put(jnp.zeros((batch, crop, crop), jnp.int32), dev)
        mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
        step = make_train_step(model, criterion, tx, mesh, compute_dtype=half,
                               donate=False)

        log("warm step (compile)")
        state2, loss = step(state, images, masks)
        log(f"warm loss {float(np.asarray(loss)):.4f}; tracing {steps} steps")

        shutil.rmtree(prof_dir, ignore_errors=True)
        with jax.profiler.trace(prof_dir):
            st = state
            for _ in range(steps):
                st, loss = step(st, images, masks)
            lv = float(np.asarray(loss))
        log(f"traced (loss {lv:.4f}); parsing")

    files = sorted(glob.glob(os.path.join(prof_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not files:
        print(json.dumps({"tool": "profile_step", "planes": None,
                          "note": "no xplane files produced"}), flush=True)
        return
    planes = parse_xspace(files[-1])
    report = {}
    for pname, agg in planes.items():
        total = sum(v[1] for v in agg.values())
        top = sorted(agg.items(), key=lambda kv: -kv[1][1])[:60]
        report[pname] = {
            "total_ms": round(total, 2),
            "events": len(agg),
            "top": [
                {"op": k[:120], "n": v[0], "ms": round(v[1], 3)}
                for k, v in top
            ],
        }
    # device planes first, compact host planes
    out = {
        "tool": "profile_step",
        "steps": steps,
        "planes": {
            p: (r if ("TPU" in p or "tpu" in p or "axon" in p or
                      "device" in p.lower())
               else {"total_ms": r["total_ms"], "events": r["events"]})
            for p, r in report.items()
        },
    }
    print(json.dumps(out), flush=True)
    with open("/tmp/profile_report.json", "w") as f:
        json.dump(report, f, indent=1)
    log("full report -> /tmp/profile_report.json")


if __name__ == "__main__":
    main()
