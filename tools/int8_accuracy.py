"""int8 accuracy validation (VERDICT r2 missing #2).

Trains the flagship architecture (DeepLabv3+/Xception-65, slim middle
flow for CPU compile time) on the synthetic dataset to convergence-ish,
then runs the COMPLETE TTA eval (multi-scale + flip + sliding windows)
three ways and reports the metric-level cost of the int8 headline path:

  1. f32/bf16 parity-exact path            (TPU.INT8_ACTIVATIONS off)
  2. int8 "pw" with the 6-sigma heuristic  (the bench default)
  3. int8 "pw" with measured-amax ranges   (engine/calibrate.py)

Prints a table of mIoU / pixAcc / per-class IoU deltas / argmax
agreement, machine-readable JSON on the last line. Run on the CPU mesh:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/int8_accuracy.py [EPOCHS]

(no real datasets exist in this environment — reference mount empty,
zero egress — so the synthetic set is the default metric-level
evidence; results recorded in BASELINE.md "int8 accuracy". Pass
``--real-photo`` to run the same protocol on a mini Pascal-VOC tree of
REAL-photograph crops (data/sample_photo.py) — real pixel statistics
through the trained model and the full TTA eval.)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# This is a CPU-mesh tool (metric-level accuracy, not perf). Env
# JAX_PLATFORMS does not stick here — sitecustomize imports jax at
# interpreter startup — so force the platform in-process before first
# backend use, exactly like tests/conftest.py.
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from segmentron_tpu.config import cfg


REAL_PHOTO = "--real-photo" in sys.argv
if REAL_PHOTO:
    sys.argv.remove("--real-photo")


def setup(epochs: int):
    cfg.defrost()
    if REAL_PHOTO:
        # metric-level int8 accuracy on REAL pixels (VERDICT r4 weak #5
        # "synthetic-only"): a mini Pascal-VOC tree of real-photograph
        # crops (data/sample_photo.py) replaces the synthetic set
        import tempfile

        from segmentron_tpu.data.sample_photo import build_mini_voc

        root = tempfile.mkdtemp(prefix="int8_real_photo_")
        build_mini_voc(root, train=24, val=8, size=160, seed=11)
        cfg.ROOT_PATH = root
        cfg.DATASET.NAME = "pascal_voc"
    else:
        cfg.DATASET.NAME = "synthetic"
    cfg.DATASET.WORKERS = 2
    cfg.MODEL.MODEL_NAME = "DeepLabV3_Plus"
    cfg.MODEL.BACKBONE = "xception65"
    cfg.MODEL.OUTPUT_STRIDE = 16
    cfg.MODEL.XCEPTION.MIDDLE_BLOCKS = 4  # CPU compile-time bound; the
    #   quantized layer TYPES (entry/middle/exit sepconvs, skips) are
    #   all exercised, with 4 instead of 16 repeats of the middle block
    cfg.TRAIN.EPOCHS = epochs
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TRAIN.CROP_SIZE = 64
    cfg.TRAIN.BASE_SIZE = 80
    cfg.TRAIN.BACKBONE_PRETRAINED = False
    cfg.TRAIN.SNAPSHOT_EPOCH = 10_000  # no checkpoints needed
    cfg.SOLVER.LR = 0.02
    cfg.SOLVER.AUX = False
    cfg.TPU.PREFETCH = 0
    cfg.TEST.SCALES = [0.75, 1.0]
    cfg.TEST.FLIP = True
    cfg.TEST.CROP_SIZE = 64
    cfg.TEST.DISTRIBUTED = False
    cfg.DATASET.MODE = "testval"


def evaluate(variables, tag):
    from segmentron_tpu.engine import Evaluator

    ev = Evaluator(args=None, variables=variables)
    if not REAL_PHOTO:  # synthetic-only size knobs; VOC evals its val split
        ev.dataset.length = 16
        ev.dataset.image_size = (96, 96)
    pix_acc, miou, cat_iou = ev.eval()
    print(f"[{tag}] pixAcc {pix_acc:.4f} mIoU {miou:.4f}")
    return {
        "pix_acc": float(pix_acc),
        "miou": float(miou),
        "cat_iou": [float(x) for x in cat_iou],
    }


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    setup(epochs)
    from segmentron_tpu.engine import Trainer
    from segmentron_tpu.engine.calibrate import calibrate_int8_amax

    class A:
        log_iter, val_epoch, skip_val, resume = 20, 10_000, True, False

    trainer = Trainer(args=A())
    final_loss = trainer.train()
    print(f"trained {epochs} epochs, final loss {final_loss:.4f}")
    variables = {
        "params": jax.device_get(trainer.state.params),
        "batch_stats": jax.device_get(trainer.state.batch_stats),
    }

    results = {}
    cfg.defrost()
    cfg.TPU.INT8_ACTIVATIONS = False
    results["f32"] = evaluate(variables, "f32")

    cfg.defrost()
    cfg.TPU.INT8_ACTIVATIONS = "pw"
    results["int8_pw_heuristic"] = evaluate(variables, "int8-pw 6-sigma")

    # measured-amax calibration over 8 val batches. Collect the RAW
    # ranges once (headroom 1.0), then sweep the headroom multiplier by
    # scaling the collection — answers whether widening the measured
    # ranges recovers the outlier-clipping deficit vs the 6-sigma
    # heuristic (BASELINE.md int8-accuracy caveats).
    cfg.defrost()
    cfg.TPU.INT8_ACTIVATIONS = "pw"
    cfg.TPU.INT8_CALIBRATION_HEADROOM = 1.0
    from segmentron_tpu.data import get_segmentation_dataset

    cal_ds = get_segmentation_dataset(
        cfg.DATASET.NAME, split="val", mode="testval"
    )
    if not REAL_PHOTO:
        cal_ds.length, cal_ds.image_size = 8, (96, 96)
    cal_batches = [
        np.asarray(cal_ds[i][0])[None] for i in range(min(8, len(cal_ds)))
    ]
    calibrated = calibrate_int8_amax(
        trainer.model, dict(variables), cal_batches
    )
    results["int8_pw_calibrated"] = evaluate(calibrated, "int8-pw calibrated")

    raw_amax = calibrated["quant_amax"]
    for headroom in (1.25, 1.5, 2.0):
        widened = dict(calibrated)
        widened["quant_amax"] = jax.tree.map(
            lambda a: a * headroom, raw_amax
        )
        results[f"int8_pw_calibrated_h{headroom}"] = evaluate(
            widened, f"int8-pw calibrated x{headroom}"
        )

    f32_vars = variables
    cfg.TPU.INT8_ACTIVATIONS = "pw"
    # agreement f32-vs-int8: predict fn reads cfg at trace; easiest is
    # two Evaluator-style passes — compare via fresh predicts
    from segmentron_tpu.engine.steps import make_predict_fn
    from segmentron_tpu.models import get_segmentation_model

    model = get_segmentation_model()
    ds = get_segmentation_dataset(cfg.DATASET.NAME, split="val", mode="testval")
    if not REAL_PHOTO:
        ds.length, ds.image_size = 8, (96, 96)

    def preds(variables, int8):
        cfg.defrost()
        cfg.TPU.INT8_ACTIVATIONS = "pw" if int8 else False
        predict = make_predict_fn(model)
        out = []
        for i in range(len(ds)):
            img = np.asarray(ds[i][0])[None]
            out.append(np.argmax(np.asarray(predict(variables, img)), -1))
        return np.stack(out)

    p_f32 = preds(f32_vars, False)
    p_heur = preds(f32_vars, True)
    p_cal = preds(calibrated, True)
    results["agreement_heuristic"] = float((p_f32 == p_heur).mean())
    results["agreement_calibrated"] = float((p_f32 == p_cal).mean())

    d_heur = results["int8_pw_heuristic"]["miou"] - results["f32"]["miou"]
    d_cal = results["int8_pw_calibrated"]["miou"] - results["f32"]["miou"]
    print(f"\nmIoU delta: heuristic {d_heur:+.4f}, calibrated {d_cal:+.4f}")
    for k in sorted(results):
        if k.startswith("int8_pw_calibrated_h"):
            d = results[k]["miou"] - results["f32"]["miou"]
            print(f"mIoU delta: {k} {d:+.4f}")
            results[f"miou_delta_{k[len('int8_pw_'):]}" ] = float(d)
    print(f"argmax agreement vs f32: heuristic "
          f"{results['agreement_heuristic']:.4%}, calibrated "
          f"{results['agreement_calibrated']:.4%}")
    per_class = np.asarray(results["int8_pw_heuristic"]["cat_iou"]) - \
        np.asarray(results["f32"]["cat_iou"])
    print(f"worst per-class IoU delta (heuristic): {per_class.min():+.4f}")
    results["miou_delta_heuristic"] = float(d_heur)
    results["miou_delta_calibrated"] = float(d_cal)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
