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
from ..utils import SegmentationMetric, get_logger
from ..utils.checkpoint import CheckpointManager
from .steps import make_predict_fn
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
        self.variables = variables
        self.predict_fn = make_predict_fn(
            self.model, compute_dtype=jnp.dtype(cfg.TPU.COMPUTE_DTYPE)
        )
        self.metric = SegmentationMetric(self.nclass)

    def _load_variables(self):
        path = cfg.TEST.TEST_MODEL_PATH
        sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
        template = self.model.init(jax.random.PRNGKey(0), sample)
        if not path:
            self.logger.warning(
                "TEST.TEST_MODEL_PATH empty - evaluating randomly-initialised model"
            )
            return template
        ckpt = CheckpointManager(path)
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

    def eval(self):
        self.metric.reset()
        scales = list(cfg.TEST.SCALES)
        flip = bool(cfg.TEST.FLIP)
        crop = cfg.TEST.CROP_SIZE
        t0 = time.time()
        n_img = 0
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
