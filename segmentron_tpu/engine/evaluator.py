"""Evaluator (reference: ``tools/eval.py::Evaluator`` — SURVEY.md §3.2).

Whole-image ('testval') evaluation with multi-scale + flip TTA and
sliding-window inference for images larger than ``TEST.CROP_SIZE``,
accumulating the on-device confusion matrix. Exports per-class IoU and
the class histograms (the bit-for-bit comparison artifact).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import cfg
from ..data import DataLoader, get_segmentation_dataset
from ..models import get_segmentation_model
from ..utils import SegmentationMetric, create_mesh, get_logger
from ..utils.checkpoint import CheckpointManager
from ..utils.distributed import batch_sharding
from .steps import make_predict_fn, make_tta_eval_step
from .tta import multi_scale_predict

__all__ = ["Evaluator"]


class Evaluator:
    def __init__(self, args=None, variables=None):
        self.args = args
        self.logger = get_logger()
        self.dataset = get_segmentation_dataset(
            cfg.DATASET.NAME,
            split="val",
            mode=cfg.DATASET.MODE,
            crop_size=cfg.TEST.CROP_SIZE or cfg.TRAIN.CROP_SIZE,
        )
        if bool(cfg.TPU.DEVICE_NORMALIZE) and cfg.DATASET.MODE == "testval":
            # whole-image eval ships raw uint8; (x/255 - mean)/std runs
            # in-graph (<=1-2 ulp identical) — removes the measured host
            # normalize bottleneck (BASELINE.md r4 testval feed)
            from ..data.device_input import DeviceInput

            self.dataset.device_input = DeviceInput(normalize_only=True)
        self.loader = DataLoader(
            self.dataset,
            batch_size=1 if cfg.DATASET.MODE == "testval" else cfg.TEST.BATCH_SIZE,
            shuffle=False,
            num_workers=cfg.DATASET.WORKERS,
            prefetch=cfg.TPU.PREFETCH,
        )
        self.nclass = self.dataset.num_class
        self.model = get_segmentation_model()
        if variables is None:
            variables = self._load_variables()
        n_cal = int(cfg.TPU.INT8_CALIBRATION_BATCHES)
        if cfg.TPU.INT8_ACTIVATIONS and n_cal > 0:
            from .calibrate import calibrate_int8_amax

            self.logger.info(
                "Calibrating int8 ranges on %d val batches", n_cal
            )
            # testval loaders yield NATIVE image sizes — feeding them
            # straight to the jitted observe() would compile the full
            # f32 model once per unique (H, W) (5-40 min each through
            # the relay). Center-crop/pad every calibration image to
            # ONE static shape: activation-range statistics don't need
            # exact eval geometry, they need one compile.
            side = int(cfg.TEST.CROP_SIZE or 512)

            def _fixed(img):
                img = np.asarray(img)
                if img.ndim == 3:
                    img = img[None]
                _, h, w, c = img.shape
                y0 = max((h - side) // 2, 0)
                x0 = max((w - side) // 2, 0)
                img = img[:, y0 : y0 + side, x0 : x0 + side]
                ph, pw = side - img.shape[1], side - img.shape[2]
                if ph or pw:
                    img = np.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)))
                    if img.dtype == np.uint8:
                        # raw-u8 loader mode: observe() normalizes
                        # in-graph, so u8-zero pad would become
                        # ~(-mean/std) ≈ -2 — a border value the eval
                        # graphs never produce (they pad AFTER
                        # normalize, at 0). Pad at the mean pixel so
                        # the apron normalizes to ~0 like eval.
                        mean_px = np.round(
                            np.asarray(cfg.DATASET.MEAN) * 255.0
                        ).astype(np.uint8)
                        img[:, side - ph :, :, :] = mean_px
                        img[:, :, side - pw :, :] = mean_px
                return img

            batches = (
                _fixed(b["image"] if isinstance(b, dict) else b)
                for _, b in zip(range(n_cal), iter(self.loader))
            )
            variables = calibrate_int8_amax(self.model, variables, batches)
        self.variables = variables
        n_dev = len(jax.devices())
        self.mesh = None
        if bool(cfg.TEST.SPATIAL_SHARD) and n_dev > 1:
            # sequence-parallel analogue: shard image height over the
            # mesh so full-res attention activations fit (SURVEY §5.7)
            from ..parallel.spatial import make_spatial_predict_fn

            mesh = create_mesh([n_dev], ("model",))
            spatial = make_spatial_predict_fn(self.model, mesh)
            self.predict_fn = lambda v, im: spatial(v, im).astype(jnp.float32)
        else:
            self.predict_fn = make_predict_fn(
                self.model, compute_dtype=jnp.dtype(cfg.TPU.COMPUTE_DTYPE)
            )
            if bool(cfg.TEST.DISTRIBUTED) and n_dev > 1:
                self.mesh = create_mesh([n_dev], ("data",))
        self._tta_step = None
        self.metric = SegmentationMetric(self.nclass)

    def _load_variables(self):
        path = cfg.TEST.TEST_MODEL_PATH
        sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
        # init on the host CPU backend: a chip init compile through the
        # relay is minutes of dead time (CLAUDE.md)
        with jax.default_device(jax.devices("cpu")[0]):
            template = jax.jit(self.model.init)(jax.random.PRNGKey(0), sample)
        if not path:
            self.logger.warning(
                "TEST.TEST_MODEL_PATH empty - evaluating randomly-initialised model"
            )
            return template
        use_best = bool(cfg.TEST.USE_BEST) or bool(
            getattr(self.args, "best", False)
        )
        ckpt = CheckpointManager(path)
        if use_best:
            restored = ckpt.restore_best_raw()
            if restored is None:
                raise FileNotFoundError(
                    f"No best checkpoint under {ckpt.best_directory} "
                    "(train with validation enabled to produce one)"
                )
            meta = ckpt.best_meta()
            if meta:
                self.logger.info(
                    "Restoring BEST checkpoint: step %d, mIoU %.4f",
                    meta["step"], meta["miou"],
                )
        else:
            restored = ckpt.restore_raw()
        if restored is None:
            raise FileNotFoundError(f"No checkpoint found under {path}")
        # accept either a full TrainState checkpoint or bare variables
        if "params" not in restored:
            raise KeyError(f"Checkpoint has no 'params': {list(restored)}")
        return {
            "params": restored["params"],
            "batch_stats": restored.get("batch_stats", {}) or {},
        }

    def _tta_step_for(self, shape):
        """The sharded TTA program (shape-independent builder: its own
        jit cache compiles one executable per input-shape bucket, so a
        single instance serves every shape)."""
        del shape
        if self._tta_step is None:
            crop = cfg.TEST.CROP_SIZE
            self._tta_step = make_tta_eval_step(
                self.model,
                self.nclass,
                self.mesh,
                scales=tuple(cfg.TEST.SCALES),
                flip=bool(cfg.TEST.FLIP),
                crop_size=int(crop) if crop else None,
                compute_dtype=jnp.dtype(cfg.TPU.COMPUTE_DTYPE),
            )
        return self._tta_step

    def _eval_distributed(self):
        """Images round-robin over the data mesh, grouped by shape; the
        per-shard TTA pipelines run concurrently and the confusion
        matrix arrives psum'd. Ragged tails are padded with repeated
        images whose masks are all ignore (-1): zero CM contribution, so
        the result is bit-identical to the single-device path."""
        n_dev = self.mesh.size
        buckets = {}
        n_img = 0

        def flush(shape):
            imgs, masks = buckets.pop(shape)
            k = len(imgs)
            while len(imgs) % n_dev:
                imgs.append(imgs[-1])
                masks.append(np.full_like(masks[-1], -1))
            images = jax.device_put(
                np.stack(imgs), batch_sharding(self.mesh)
            )
            targets = jax.device_put(
                np.stack(masks), batch_sharding(self.mesh)
            )
            cm = self._tta_step_for(shape)(self.variables, images, targets)
            self.metric.update_cm(cm)
            return k

        for batch in self.loader:
            for i in range(batch["image"].shape[0]):
                img = np.asarray(batch["image"][i])
                mask = np.asarray(batch["mask"][i])
                key = img.shape
                buckets.setdefault(key, ([], []))
                buckets[key][0].append(img)
                buckets[key][1].append(mask)
                if len(buckets[key][0]) == n_dev:
                    n_img += flush(key)
        for shape in list(buckets):
            n_img += flush(shape)
        return n_img

    def _eval_bucketed(self):
        """Variable-size testval: one compiled program per shape bucket
        (engine/bucketed.py), instead of one per unique image size."""
        from .bucketed import BucketedTTA

        crop = cfg.TEST.CROP_SIZE
        tta = BucketedTTA(
            self.predict_fn,
            self.nclass,
            scales=tuple(cfg.TEST.SCALES),
            flip=bool(cfg.TEST.FLIP),
            crop_size=int(crop) if crop else None,
        )
        quant = int(cfg.TEST.BUCKET_QUANT)
        n_img = 0
        for batch in self.loader:
            for i in range(batch["image"].shape[0]):
                cm = tta(
                    self.variables,
                    np.asarray(batch["image"][i]),
                    np.asarray(batch["mask"][i]),
                    quant=quant,
                )
                self.metric.update_cm(cm)
                n_img += 1
        return n_img

    def eval(self):
        self.metric.reset()
        scales = list(cfg.TEST.SCALES)
        flip = bool(cfg.TEST.FLIP)
        crop = cfg.TEST.CROP_SIZE
        t0 = time.time()
        n_img = 0
        if int(cfg.TEST.BUCKET_QUANT) > 0:
            n_img = self._eval_bucketed()
        elif self.mesh is not None:
            n_img = self._eval_distributed()
        else:
            for batch in self.loader:
                image = jnp.asarray(batch["image"])
                mask = np.asarray(batch["mask"])
                probs = multi_scale_predict(
                    self.predict_fn,
                    self.variables,
                    image,
                    self.nclass,
                    scales=scales,
                    flip=flip,
                    crop_size=int(crop) if crop else None,
                )
                self.metric.update(jnp.argmax(probs, axis=-1), mask)
                n_img += image.shape[0]
        dt = time.time() - t0
        pix_acc, miou, category_iou = self.metric.get(return_category_iou=True)
        self.logger.info(
            "Eval: %d images in %.1fs (%.2f img/s) | pixAcc %.4f | mIoU %.4f",
            n_img, dt, n_img / max(dt, 1e-6), pix_acc, miou,
        )
        classes = getattr(self.dataset, "CLASSES", None)
        for i, iou in enumerate(category_iou):
            cname = classes[i] if classes and i < len(classes) else str(i)
            self.logger.info("  class %-20s IoU %.4f", cname, iou)
        return pix_acc, miou, category_iou
