"""Evaluator TEST.SPATIAL_SHARD path: whole-image forwards GSPMD-shard
the image height across the mesh (parallel/spatial.py); results must
match the unsharded Evaluator.
"""

import numpy as np


def _build(fresh_cfg, spatial):
    from segmentron_tpu.engine.evaluator import Evaluator

    fresh_cfg.MODEL.MODEL_NAME = "UNet"
    fresh_cfg.MODEL.BACKBONE = ""
    fresh_cfg.DATASET.NAME = "synthetic"
    fresh_cfg.DATASET.MODE = "testval"
    fresh_cfg.SOLVER.AUX = False
    fresh_cfg.TRAIN.SYNC_BATCH_NORM = False
    fresh_cfg.TEST.SCALES = [1.0]
    fresh_cfg.TEST.FLIP = False
    fresh_cfg.TEST.CROP_SIZE = None  # whole-image forwards only
    fresh_cfg.TEST.TEST_MODEL_PATH = ""
    fresh_cfg.TEST.DISTRIBUTED = False
    fresh_cfg.TEST.SPATIAL_SHARD = spatial
    ev = Evaluator(args=None)
    ev.dataset.length = 2
    ev.dataset.image_size = (32, 48)
    return ev


def test_spatial_shard_eval_matches_unsharded(fresh_cfg):
    ev_sp = _build(fresh_cfg, spatial=True)
    assert ev_sp.mesh is None  # spatial mode replaces the data mesh
    variables = ev_sp.variables
    ev_sp.eval()
    cm_sp = ev_sp.metric.confusion_matrix

    ev = _build(fresh_cfg, spatial=False)
    ev.variables = variables
    ev.eval()
    np.testing.assert_array_equal(cm_sp, ev.metric.confusion_matrix)
    assert cm_sp.sum() > 0
