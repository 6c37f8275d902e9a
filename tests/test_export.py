"""Serving-export roundtrip: serialize the jitted forward (StableHLO)
plus variables, reload WITHOUT the model object, and match the live
model's logits exactly."""

import jax
import numpy as np


def test_export_roundtrip(fresh_cfg, tmp_path):
    from segmentron_tpu.engine.export import export_model, load_exported
    from segmentron_tpu.models import get_segmentation_model

    fresh_cfg.MODEL.MODEL_NAME = "FCN"
    fresh_cfg.MODEL.BACKBONE = "resnet18"
    fresh_cfg.DATASET.NAME = "synthetic"
    fresh_cfg.SOLVER.AUX = False
    fresh_cfg.TRAIN.SYNC_BATCH_NORM = False
    model = get_segmentation_model()
    x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model.apply(variables, x)[0])

    out_dir = export_model(model, variables, (1, 64, 64, 3), str(tmp_path / "art"))
    loaded = load_exported(out_dir)
    got = np.asarray(loaded(x))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
