"""Spatial (GSPMD) partitioning correctness: height-sharded inference
over a ('data','model') CPU mesh must equal single-device inference —
this validates that XLA's automatic conv halo exchange preserves
numerics (SURVEY.md §2.9 spatial-sharding plan)."""

import jax
import numpy as np
import pytest


def test_spatial_sharded_predict_matches_single_device(fresh_cfg):
    from segmentron_tpu.models import get_segmentation_model
    from segmentron_tpu.parallel import create_mesh, make_spatial_predict_fn

    fresh_cfg.MODEL.MODEL_NAME = "FCN"
    fresh_cfg.MODEL.BACKBONE = "resnet18"
    fresh_cfg.DATASET.NAME = "synthetic"
    fresh_cfg.SOLVER.AUX = False
    fresh_cfg.TRAIN.SYNC_BATCH_NORM = False
    model = get_segmentation_model()

    x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    ref = np.asarray(model.apply(variables, x)[0])

    mesh = create_mesh([2, 4], ("data", "model"))
    predict = make_spatial_predict_fn(model, mesh, axis="model")
    out = np.asarray(predict(variables, x))

    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_hybrid_dp_spatial_predict_matches_single_device(fresh_cfg):
    """2-D hybrid sharding: batch over 'data' AND height over 'model'
    on one (2, 4) mesh — GSPMD must still reproduce the single-device
    forward bit-for-tolerance (halo exchanges along H, independent
    images along N)."""
    from segmentron_tpu.models import get_segmentation_model
    from segmentron_tpu.parallel import create_mesh, make_spatial_predict_fn

    fresh_cfg.MODEL.MODEL_NAME = "FCN"
    fresh_cfg.MODEL.BACKBONE = "resnet18"
    fresh_cfg.DATASET.NAME = "synthetic"
    fresh_cfg.SOLVER.AUX = False
    fresh_cfg.TRAIN.SYNC_BATCH_NORM = False
    model = get_segmentation_model()

    x = np.random.RandomState(1).randn(4, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])

    ref = np.asarray(model.apply(variables, x)[0])

    mesh = create_mesh([2, 4], ("data", "model"))
    predict = make_spatial_predict_fn(
        model, mesh, axis="model", batch_axis="data"
    )
    out = np.asarray(predict(variables, x))

    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
