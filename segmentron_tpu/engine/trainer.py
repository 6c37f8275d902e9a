"""Trainer (reference: ``tools/train.py::Trainer`` — call stack SURVEY.md §3.1).

End-to-end: datasets -> loaders -> model init -> loss/optimizer/
schedule -> sharded jitted train step -> epoch loop with rank-0
logging (loss / lr / ETA / images-per-sec-per-chip), periodic orbax
snapshots, validation with psum'd confusion matrices, best-model
tracking, auto-resume.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import cfg
from ..data import DataLoader, get_segmentation_dataset
from ..models import get_segmentation_model
from ..solver import get_lr_scheduler, get_optimizer, get_segmentation_loss
from ..utils import (
    SegmentationMetric,
    batch_sharding,
    create_mesh,
    get_logger,
    replicate_sharding,
    show_flops_params,
)
from ..utils.checkpoint import CheckpointManager
from .steps import TrainState, make_eval_step, make_train_step

__all__ = ["Trainer"]


class Trainer:
    def __init__(self, args=None, rng_key=None):
        self.args = args
        self.logger = get_logger()
        self.mesh = create_mesh(
            list(cfg.TPU.MESH_SHAPE) or None, tuple(cfg.TPU.MESH_AXES)
        )
        self.batch_sharding = batch_sharding(self.mesh)
        self.replicated = replicate_sharding(self.mesh)
        # the batch shards over the 'data' axis ONLY — on a multi-axis
        # mesh (e.g. data x model hybrid) the other axes don't
        # constrain it
        self.data_par = int(self.mesh.shape["data"])
        if cfg.TRAIN.BATCH_SIZE % self.data_par != 0:
            raise ValueError(
                f"TRAIN.BATCH_SIZE={cfg.TRAIN.BATCH_SIZE} must be divisible "
                f"by the 'data' mesh axis ({self.data_par}) — the batch is "
                "sharded over it"
            )

        # ------------------------------------------------------- data
        data_kwargs = dict(
            base_size=cfg.TRAIN.BASE_SIZE, crop_size=cfg.TRAIN.CROP_SIZE
        )
        self.train_dataset = get_segmentation_dataset(
            cfg.DATASET.NAME, split="train", mode="train", **data_kwargs
        )
        self.val_dataset = get_segmentation_dataset(
            cfg.DATASET.NAME, split="val", mode="val", **data_kwargs
        )
        # on-device train augmentation (VERDICT r4 #1): host ships raw
        # uint8 canvases, the jitted step does scale/crop/flip/blur/
        # normalize. Needs a static source canvas; datasets without one
        # keep the host augment.
        self.device_augment = None
        if bool(cfg.TPU.DEVICE_AUGMENT):
            from ..data.device_input import DeviceInput, resolve_canvas
            from ..ops.preprocess import DeviceAugment

            canvas = resolve_canvas(self.train_dataset)
            if canvas is not None:
                self.train_dataset.device_input = DeviceInput(
                    self.train_dataset, canvas=canvas
                )
                self.device_augment = DeviceAugment(
                    crop=cfg.TRAIN.CROP_SIZE,
                    mean=list(cfg.DATASET.MEAN),
                    std=list(cfg.DATASET.STD),
                    pad_label=self.train_dataset.device_input.pad_label,
                )
                self.logger.info(
                    "Device input pipeline: train augment on device "
                    "(canvas %dx%d)", canvas[0], canvas[1],
                )
            else:
                self.logger.info(
                    "TPU.DEVICE_AUGMENT set but dataset %s has no static "
                    "canvas (set DATASET.DEVICE_CANVAS) — host augment",
                    cfg.DATASET.NAME,
                )
        self.train_loader = DataLoader(
            self.train_dataset,
            batch_size=cfg.TRAIN.BATCH_SIZE,
            shuffle=True,
            seed=cfg.SEED,
            num_workers=cfg.DATASET.WORKERS,
            prefetch=cfg.TPU.PREFETCH,
            sharding=self.batch_sharding,
        )
        # sharded eval: batch must divide evenly over the data axis
        val_bs = -(-int(cfg.TEST.BATCH_SIZE) // self.data_par) * self.data_par
        self.val_loader = DataLoader(
            self.val_dataset,
            batch_size=val_bs,
            shuffle=False,
            # keep the ragged tail: validate() pads it with ignore
            # pixels, so every val image counts (histogram parity)
            drop_last=False,
            num_workers=cfg.DATASET.WORKERS,
            prefetch=cfg.TPU.PREFETCH,
            sharding=self.batch_sharding,
        )
        self.iters_per_epoch = len(self.train_loader)
        self.max_iters = cfg.TRAIN.EPOCHS * self.iters_per_epoch

        # ------------------------------------------------------ model
        self.model = get_segmentation_model()
        self.nclass = self.train_dataset.num_class
        rng_key = rng_key if rng_key is not None else jax.random.PRNGKey(cfg.SEED)
        init_rng, self.run_rng = jax.random.split(rng_key)
        sample = jnp.zeros(
            (1, cfg.TRAIN.CROP_SIZE, cfg.TRAIN.CROP_SIZE, 3), jnp.float32
        )
        # init on the host CPU backend: through the relay a chip init
        # compile is minutes of dead time and a kill hazard (CLAUDE.md)
        with jax.default_device(jax.devices("cpu")[0]):
            variables = jax.jit(self.model.init)(init_rng, sample)
        if cfg.TRAIN.BACKBONE_PRETRAINED and cfg.MODEL.BACKBONE:
            from ..utils.download import resolve_pretrained
            from ..utils.torch_convert import load_backbone_pretrained

            path = resolve_pretrained(
                cfg.MODEL.BACKBONE.lower(), cfg.TRAIN.BACKBONE_PRETRAINED_PATH
            )
            if path:
                variables = load_backbone_pretrained(
                    variables, cfg.MODEL.BACKBONE.lower(), path
                )
            else:
                self.logger.info(
                    "No pretrained weights found for backbone %s; training "
                    "from scratch", cfg.MODEL.BACKBONE,
                )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        show_flops_params(self.model, variables, sample.shape, self.logger)

        # ----------------------------------------------------- solver
        self.criterion = get_segmentation_loss(
            cfg.MODEL.MODEL_NAME,
            use_ohem=cfg.SOLVER.OHEM,
            aux=cfg.SOLVER.AUX,
            aux_weight=cfg.SOLVER.AUX_WEIGHT,
            loss_name=cfg.SOLVER.LOSS_NAME,
            ohem_thresh=cfg.SOLVER.OHEM_THRESH,
            ohem_min_kept=cfg.SOLVER.OHEM_MIN_KEPT,
            multi_loss_weight=list(cfg.MODEL.MULTI_LOSS_WEIGHT),
            se_weight=cfg.MODEL.ENCNET.SE_WEIGHT,
        )
        self.lr_schedule = get_lr_scheduler(cfg, self.iters_per_epoch)
        self.tx = get_optimizer(cfg, params, self.lr_schedule)

        state = TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            rng=self.run_rng,
        )
        self.state = jax.device_put(state, self.replicated)

        # ------------------------------------------------------ steps
        compute_dtype = jnp.dtype(cfg.TPU.COMPUTE_DTYPE)
        if compute_dtype != jnp.float32:
            self.logger.info("Mixed precision: %s compute, fp32 params",
                             compute_dtype.name)
        self.train_step = make_train_step(
            self.model, self.criterion, self.tx, self.mesh,
            donate=bool(cfg.TPU.DONATE), compute_dtype=compute_dtype,
            remat=str(cfg.TPU.REMAT), augment=self.device_augment,
        )
        self.eval_step = make_eval_step(
            self.model, self.nclass, self.mesh, compute_dtype=compute_dtype
        )

        # ------------------------------------------------- checkpoint
        self.ckpt = CheckpointManager(
            os.path.join(cfg.TRAIN.MODEL_SAVE_DIR or "runs/checkpoints", "orbax")
        )
        self.best_miou = 0.0
        self.start_epoch = 0
        if cfg.TRAIN.RESUME_MODEL_PATH or (args is not None and getattr(args, "resume", False)):
            self._resume()

    # ------------------------------------------------------------------
    def _resume(self) -> None:
        # TRAIN.RESUME_MODEL_PATH may name a DIFFERENT run's orbax dir
        # (the reference points it at an arbitrary checkpoint file) —
        # restore from there, not from this run's save dir
        src = self.ckpt
        path = str(cfg.TRAIN.RESUME_MODEL_PATH or "")
        if path and os.path.abspath(path) != os.path.abspath(src.directory):
            if not os.path.isdir(path):
                raise FileNotFoundError(
                    f"TRAIN.RESUME_MODEL_PATH={path!r} not found"
                )
            src = CheckpointManager(path)
        # best_miou persists in best_meta.json so RESUME keeps
        # tracking; a fresh run in a reused save dir must NOT inherit a
        # previous run's best (it would suppress save_best and leave
        # --best pointing at stale params), hence reading it only here
        meta = src.best_meta()
        self.best_miou = float(meta["miou"]) if meta else 0.0
        restored = src.restore_latest(jax.device_get(self.state))
        if restored is not None:
            self.state = jax.device_put(restored, self.replicated)
            step = int(jax.device_get(self.state.step))
            self.start_epoch = step // max(self.iters_per_epoch, 1)
            self.logger.info(
                "Resumed from step %d (epoch %d)", step, self.start_epoch
            )

    # ------------------------------------------------------------------
    def train(self) -> float:
        # clamp to >=1: a 0 from the CLI must not ZeroDivisionError the loop
        log_iters = max(1, getattr(self.args, "log_iter", 10) if self.args else 10)
        val_epoch = max(1, getattr(self.args, "val_epoch", 1) if self.args else 1)
        skip_val = getattr(self.args, "skip_val", False) if self.args else False
        epochs = cfg.TRAIN.EPOCHS
        if cfg.UTILS.EPOCH_STOP > 0:
            epochs = min(epochs, cfg.UTILS.EPOCH_STOP)
        n_devices = self.mesh.size
        start = time.time()
        last_log = start
        imgs_since_log = 0
        final_loss = float("nan")
        loss = None
        run_iter0 = self.start_epoch * self.iters_per_epoch  # for ETA

        # optional jax.profiler window (SURVEY §5.1): trace steps
        # [PROFILE_START, PROFILE_START + PROFILE_STEPS)
        prof_n = int(cfg.UTILS.PROFILE_STEPS)
        prof_lo = int(cfg.UTILS.PROFILE_START)
        profiling = False

        for epoch in range(self.start_epoch, epochs):
            self.train_loader.set_epoch(epoch)
            for it, batch in enumerate(self.train_loader):
                global_step = epoch * self.iters_per_epoch + it
                # >= (not ==): a resume past PROFILE_START must still
                # honor a requested window
                if (
                    prof_n > 0 and not profiling
                    and prof_lo <= global_step < prof_lo + prof_n
                ):
                    jax.profiler.start_trace(cfg.UTILS.PROFILE_DIR)
                    profiling = True
                if self.device_augment is not None:
                    feed = {k: v for k, v in batch.items() if k != "name"}
                    self.state, loss = self.train_step(self.state, feed)
                else:
                    self.state, loss = self.train_step(
                        self.state, batch["image"], batch["mask"]
                    )
                if profiling and global_step >= prof_lo + prof_n - 1:
                    jax.block_until_ready(loss)
                    jax.profiler.stop_trace()
                    profiling = False
                    self.logger.info(
                        "Profiler trace written to %s", cfg.UTILS.PROFILE_DIR
                    )
                imgs_since_log += batch["image"].shape[0]
                step = epoch * self.iters_per_epoch + it + 1
                if step % log_iters == 0:
                    loss_v = float(jax.device_get(loss))
                    final_loss = loss_v
                    now = time.time()
                    ips = imgs_since_log / max(now - last_log, 1e-6)
                    last_log, imgs_since_log = now, 0
                    lr_v = float(self.lr_schedule(step))
                    # per-iter time from THIS run's steps only — after a
                    # resume, dividing by the global step would estimate
                    # a near-zero ETA
                    eta = (self.max_iters - step) * (now - start) / max(
                        step - run_iter0, 1
                    )
                    self.logger.info(
                        "Epoch %d/%d iter %d/%d | loss %.4f | lr %.6f | "
                        "%.2f img/s (%.2f/chip) | ETA %dm",
                        epoch + 1, epochs, it + 1, self.iters_per_epoch,
                        loss_v, lr_v, ips, ips / n_devices, int(eta / 60),
                    )
            if loss is None:
                raise RuntimeError(
                    "train loader yielded no batches — dataset smaller "
                    "than TRAIN.BATCH_SIZE with drop_last? "
                    f"(len(dataset)={len(self.train_dataset)}, "
                    f"batch={cfg.TRAIN.BATCH_SIZE})"
                )
            final_loss = float(jax.device_get(loss))
            # SNAPSHOT_EPOCH <= 0 disables periodic snapshots entirely
            if cfg.TRAIN.SNAPSHOT_EPOCH > 0 and (
                epoch + 1
            ) % cfg.TRAIN.SNAPSHOT_EPOCH == 0:
                self.ckpt.save(
                    int(jax.device_get(self.state.step)),
                    jax.device_get(self.state),
                )
                self.logger.info("Snapshot saved at epoch %d", epoch + 1)
            if not skip_val and (epoch + 1) % val_epoch == 0:
                pix_acc, miou = self.validate()
                self.logger.info(
                    "Validation epoch %d: pixAcc %.4f mIoU %.4f", epoch + 1,
                    pix_acc, miou,
                )
                if miou > self.best_miou:
                    self.best_miou = miou
                    self.ckpt.save_best(
                        int(jax.device_get(self.state.step)),
                        jax.device_get(self.state),
                        miou,
                    )
                    self.logger.info(
                        "New best mIoU %.4f — saved to %s", miou,
                        self.ckpt.best_directory,
                    )
        if profiling:
            # window extended past the last step — close the trace
            # instead of losing it at process exit
            jax.block_until_ready(loss)
            jax.profiler.stop_trace()
            self.logger.info(
                "Profiler trace written to %s", cfg.UTILS.PROFILE_DIR
            )
        self.ckpt.wait()
        return final_loss

    # ------------------------------------------------------------------
    def validate(self):
        metric = SegmentationMetric(self.nclass)
        full = None
        for batch in self.val_loader:
            images, masks = batch["image"], batch["mask"]
            n = images.shape[0]
            if full is None:
                # first batch fixes the compiled shape: round up to a
                # mesh multiple
                full = -(-n // self.mesh.size) * self.mesh.size
            if n != full:
                # shard_map needs the batch divisible by the mesh: pad
                # the ragged tail and mark the padding ignore (-1), so
                # it contributes nothing to the confusion matrix.
                pad = full - n
                images = np.concatenate(
                    [np.asarray(images),
                     np.zeros((pad,) + images.shape[1:], np.float32)], 0
                )
                masks = np.concatenate(
                    [np.asarray(masks),
                     np.full((pad,) + masks.shape[1:], -1, np.int32)], 0
                )
            cm = self.eval_step(
                self.state.params, self.state.batch_stats, images, masks
            )
            metric.update_cm(cm)
        return metric.get()
