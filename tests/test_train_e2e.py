"""End-to-end training smoke test on the 8-device CPU mesh
(SURVEY.md §4 strategy #4): synthetic dataset, tiny FCN, loss decreases,
validation + TTA eval run, checkpoint save/resume roundtrip.
"""

import os

import jax
import numpy as np
import pytest


@pytest.fixture()
def smoke_cfg(fresh_cfg, tmp_path):
    fresh_cfg.update_from_file(
        os.path.join(os.path.dirname(__file__), "..", "configs", "synthetic_fcn_smoke.yaml")
    )
    fresh_cfg.TRAIN.MODEL_SAVE_DIR = str(tmp_path / "ckpt")
    fresh_cfg.TRAIN.LOG_SAVE_DIR = str(tmp_path / "logs")
    fresh_cfg.TPU.PREFETCH = 0
    return fresh_cfg


def test_train_loss_decreases_and_validates(smoke_cfg):
    from segmentron_tpu.engine import Trainer

    trainer = Trainer()
    assert trainer.mesh.size == 8  # data-parallel over the virtual mesh

    # capture first-batch loss, then train 2 epochs and compare
    batch = next(iter(trainer.train_loader))
    state0, loss0 = trainer.train_step(trainer.state, batch["image"], batch["mask"])
    trainer.state = state0
    loss0 = float(jax.device_get(loss0))

    final_loss = trainer.train()
    assert np.isfinite(final_loss)
    assert final_loss < loss0, (loss0, final_loss)

    pix_acc, miou = trainer.validate()
    assert 0.0 <= pix_acc <= 1.0 and 0.0 <= miou <= 1.0
    # 2 epochs x ~8 tiny steps can't reliably beat 1/19 chance on the
    # 19-class synthetic mapping; the loss-decrease assertion above is the
    # learning check.  Here only guard against degenerate output (all-one
    # class / NaN metrics), which would drive pixAcc toward ~0.
    assert pix_acc > 0.02

    # checkpoint roundtrip
    trainer.ckpt.save(999, jax.device_get(trainer.state), wait=True)
    restored = trainer.ckpt.restore_latest(jax.device_get(trainer.state))
    assert int(restored.step) == int(jax.device_get(trainer.state.step))


def test_evaluator_tta_runs(smoke_cfg):
    from segmentron_tpu.config import cfg
    from segmentron_tpu.engine import Evaluator

    cfg.DATASET.MODE = "testval"
    cfg.TEST.SCALES = [0.75, 1.0]
    cfg.TEST.FLIP = True
    cfg.TEST.CROP_SIZE = 48  # force the sliding-window path on 64px imgs
    ev = Evaluator()
    ev.dataset.length = 2  # keep it tiny
    pix_acc, miou, cat_iou = ev.eval()
    assert 0.0 <= pix_acc <= 1.0
    assert len(cat_iou) == 19
    assert ev.metric.class_histogram().sum() > 0


def test_validate_handles_ragged_last_batch(smoke_cfg):
    """Cityscapes-val-style ragged tails (dataset % batch != 0) must be
    padded with ignore pixels, not crash the sharded eval step."""
    from segmentron_tpu.engine import Trainer

    trainer = Trainer()
    trainer.val_dataset.length = 10  # batches of 8 -> [8, 2(ragged)]
    pix_acc, miou = trainer.validate()
    assert 0.0 <= pix_acc <= 1.0 and 0.0 <= miou <= 1.0
