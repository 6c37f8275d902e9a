"""Serving-export roundtrip: serialize the jitted forward (StableHLO)
plus variables, reload WITHOUT the model object, and match the live
model's logits exactly."""

import jax
import jax.numpy as jnp
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


def test_export_uint8_entry_roundtrip(fresh_cfg, tmp_path):
    """Raw-pixel serving artifact (VERDICT r4 #2): uint8 NHWC in,
    normalize folded in-graph; logits match the live model fed the
    host-normalized image; the layout-cooperative prepare()+serve()
    path returns the identical result."""
    import jax.numpy as jnp

    from segmentron_tpu.engine.export import export_model, load_exported
    from segmentron_tpu.models import get_segmentation_model

    fresh_cfg.MODEL.MODEL_NAME = "FCN"
    fresh_cfg.MODEL.BACKBONE = "resnet18"
    fresh_cfg.DATASET.NAME = "synthetic"
    fresh_cfg.SOLVER.AUX = False
    fresh_cfg.TRAIN.SYNC_BATCH_NORM = False
    mean = np.asarray(fresh_cfg.DATASET.MEAN, np.float32)
    std = np.asarray(fresh_cfg.DATASET.STD, np.float32)
    model = get_segmentation_model()
    raw = (np.random.RandomState(1).rand(1, 64, 64, 3) * 255).astype(np.uint8)
    norm = ((raw.astype(np.float32) / 255.0) - mean) / std
    variables = model.init(jax.random.PRNGKey(0), norm)
    want = np.asarray(model.apply(variables, norm)[0])

    out_dir = export_model(
        model, variables, (1, 64, 64, 3), str(tmp_path / "art_u8"),
        input_dtype=jnp.uint8,
    )
    loaded = load_exported(out_dir)
    assert loaded.meta["input_dtype"] == "uint8"
    assert np.allclose(loaded.meta["mean"], mean)
    got = np.asarray(loaded(raw))
    # in-graph normalize is <= 2 ulp of the host chain -> tight but not
    # bitwise logits parity
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # layout-cooperative path: prepare() puts into the executable's
    # preferred Format, serve() runs the cached compiled artifact
    fmt = loaded.input_format()
    assert fmt is not None
    x_dev = loaded.prepare(raw)
    got2 = np.asarray(loaded.serve(x_dev))
    np.testing.assert_array_equal(got2, got)

def test_export_serve_without_meta(fresh_cfg, tmp_path):
    """An artifact directory with no meta.json (hand-assembled or old
    exporter) must still support the layout-cooperative serve path:
    the image aval falls back to the Exported's own input signature."""
    import os

    from segmentron_tpu.engine.export import export_model, load_exported
    from segmentron_tpu.models import get_segmentation_model

    fresh_cfg.MODEL.MODEL_NAME = "FCN"
    fresh_cfg.MODEL.BACKBONE = "resnet18"
    fresh_cfg.DATASET.NAME = "synthetic"
    fresh_cfg.SOLVER.AUX = False
    fresh_cfg.TRAIN.SYNC_BATCH_NORM = False
    model = get_segmentation_model()
    x = np.random.RandomState(2).randn(1, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    out_dir = export_model(model, variables, (1, 64, 64, 3), str(tmp_path / "art"))
    os.remove(os.path.join(out_dir, "meta.json"))
    loaded = load_exported(out_dir)
    assert loaded.meta == {}
    want = np.asarray(loaded(x))
    got = np.asarray(loaded.serve(loaded.prepare(x)))
    np.testing.assert_array_equal(got, want)


def test_serve_commits_weights_on_device(fresh_cfg, tmp_path):
    """serve() must not re-transfer the host-numpy weight tree on every
    call: the first compile commits each leaf to the device in the
    executable's preferred layout."""
    import jax

    from segmentron_tpu.engine.export import export_model, load_exported
    from segmentron_tpu.models import get_segmentation_model

    fresh_cfg.MODEL.MODEL_NAME = "FCN"
    fresh_cfg.MODEL.BACKBONE = "resnet18"
    fresh_cfg.DATASET.NAME = "synthetic"
    model = get_segmentation_model()
    x = np.zeros((1, 64, 64, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = jax.device_get(variables)  # host numpy, like load_exported
    out_dir = export_model(model, variables, x.shape, str(tmp_path / "m"))

    loaded = load_exported(out_dir)
    assert all(
        isinstance(leaf, np.ndarray)
        for leaf in jax.tree_util.tree_leaves(loaded.variables)
    )
    first = np.asarray(loaded.serve(loaded.prepare(x)))
    # weights are now device arrays (committed once, preferred layout)
    assert all(
        isinstance(leaf, jax.Array)
        for leaf in jax.tree_util.tree_leaves(loaded.variables)
    )
    second = np.asarray(loaded.serve(loaded.prepare(x)))
    np.testing.assert_array_equal(first, second)
