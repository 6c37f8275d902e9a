"""Best-model checkpoint semantics (reference ``tools/train.py``
best_model.pth behavior, SURVEY.md §5.4): the best checkpoint must be
immune to snapshot rotation, ``best_miou`` must survive resume, and the
Evaluator's ``--best`` path must restore the max-mIoU state — not the
latest one.
"""

import os

import jax
import numpy as np
import pytest


def _tree(step, val):
    return {
        "step": np.asarray(step, np.int32),
        "params": {"w": np.full((4,), val, np.float32)},
    }


def test_best_survives_rotation(tmp_path):
    from segmentron_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "orbax"), max_to_keep=3)
    # best happens early (step 2), then rotation pushes 5 more snapshots
    mgr.save_best(2, _tree(2, 0.5), miou=0.61)
    for s in range(3, 9):
        mgr.save(s, _tree(s, float(s)), wait=True)
    assert mgr.latest_step() == 8
    # step 2 is long rotated out of the rotating manager...
    assert 2 not in mgr._mgr.all_steps()
    # ...but the best manager still has it, with its metadata
    best = mgr.restore_best_raw()
    assert int(best["step"]) == 2
    np.testing.assert_allclose(best["params"]["w"], 0.5)
    meta = mgr.best_meta()
    assert meta == {"step": 2, "miou": 0.61}


def test_same_step_double_save_is_idempotent(tmp_path):
    from segmentron_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "orbax"))
    mgr.save(5, _tree(5, 1.0), wait=True)
    # snapshot epoch + best epoch coinciding used to call save() twice
    # with the same step id — must not raise
    mgr.save(5, _tree(5, 2.0), wait=True)
    assert mgr.restore_raw(5)["params"]["w"][0] == 1.0


@pytest.fixture()
def smoke_cfg(fresh_cfg, tmp_path):
    fresh_cfg.update_from_file(
        os.path.join(
            os.path.dirname(__file__), "..", "configs", "synthetic_fcn_smoke.yaml"
        )
    )
    fresh_cfg.TRAIN.MODEL_SAVE_DIR = str(tmp_path / "ckpt")
    fresh_cfg.TRAIN.LOG_SAVE_DIR = str(tmp_path / "logs")
    fresh_cfg.TPU.PREFETCH = 0
    return fresh_cfg


def test_trainer_best_fluctuating_val_and_resume(smoke_cfg):
    """Train 3 epochs with scripted fluctuating val mIoU; the evaluated
    best checkpoint must be the max-mIoU one (epoch 2) even though later
    snapshots exist, and a resumed Trainer must keep best_miou."""
    from segmentron_tpu.config import cfg
    from segmentron_tpu.engine import Evaluator, Trainer

    cfg.TRAIN.EPOCHS = 3
    cfg.TRAIN.SNAPSHOT_EPOCH = 1  # snapshot every epoch -> rotation happens
    cfg.UTILS.EPOCH_STOP = -1
    trainer = Trainer()
    scripted = iter([(0.9, 0.30), (0.9, 0.60), (0.9, 0.40)])
    trainer.validate = lambda: next(scripted)
    trainer.train()

    iters = trainer.iters_per_epoch
    meta = trainer.ckpt.best_meta()
    assert meta is not None
    assert meta["miou"] == pytest.approx(0.60)
    assert meta["step"] == 2 * iters  # saved at end of epoch 2
    # latest rotating snapshot is epoch 3's — NOT the best
    assert trainer.ckpt.latest_step() == 3 * iters
    best = trainer.ckpt.restore_best_raw()
    assert int(np.asarray(best["step"])) == 2 * iters

    # evaluator --best restores the epoch-2 params, not epoch-3's
    cfg.TEST.TEST_MODEL_PATH = trainer.ckpt.directory
    cfg.TEST.USE_BEST = True
    cfg.DATASET.MODE = "testval"
    ev = Evaluator()
    got = jax.tree_util.tree_leaves(ev.variables["params"])
    want = jax.tree_util.tree_leaves(best["params"])
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    # resume: a fresh Trainer on the same save dir keeps best tracking
    cfg.TRAIN.RESUME_MODEL_PATH = trainer.ckpt.directory
    trainer2 = Trainer()
    assert trainer2.best_miou == pytest.approx(0.60)


def test_fresh_trainer_does_not_inherit_stale_best(smoke_cfg):
    """A NEW run (no resume) in a reused MODEL_SAVE_DIR must start
    best_miou at 0 — inheriting a previous run's best_meta would
    suppress save_best and leave --best pointing at stale params."""
    from segmentron_tpu.config import cfg
    from segmentron_tpu.engine import Trainer

    cfg.TRAIN.EPOCHS = 1
    cfg.UTILS.EPOCH_STOP = -1
    trainer = Trainer()
    trainer.validate = lambda: (0.9, 0.55)
    trainer.train()
    assert trainer.ckpt.best_meta()["miou"] == pytest.approx(0.55)

    cfg.TRAIN.RESUME_MODEL_PATH = ""
    fresh = Trainer()  # same save dir, NOT resuming
    assert fresh.best_miou == 0.0
