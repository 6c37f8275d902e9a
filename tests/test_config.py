import pytest

from segmentron_tpu.config import SegmentronConfig, cfg


def test_attribute_access():
    c = SegmentronConfig({"A": {"B": 1}, "C": "x"})
    assert c.A.B == 1
    assert c.C == "x"
    c.A.B = 2
    assert c["A"]["B"] == 2


def test_merge_unknown_key_raises():
    c = SegmentronConfig({"A": 1})
    with pytest.raises(KeyError):
        c._merge({"ZZZ": 2})


def test_update_from_list_and_coercion(fresh_cfg):
    fresh_cfg.update_from_list(["SOLVER.LR", "0.02", "TRAIN.EPOCHS", "50"])
    assert fresh_cfg.SOLVER.LR == 0.02
    assert isinstance(fresh_cfg.SOLVER.LR, float)
    assert fresh_cfg.TRAIN.EPOCHS == 50
    fresh_cfg.update_from_list(["TRAIN.SYNC_BATCH_NORM", "False"])
    assert fresh_cfg.TRAIN.SYNC_BATCH_NORM is False


def test_update_from_file(tmp_path, fresh_cfg):
    yaml_text = """
DATASET:
  NAME: cityscapes
MODEL:
  MODEL_NAME: DeepLabV3_Plus
  BACKBONE: xception65
SOLVER:
  LR: 0.01
TEST:
  SCALES: [0.75, 1.0, 1.25]
"""
    p = tmp_path / "c.yaml"
    p.write_text(yaml_text)
    fresh_cfg.update_from_file(str(p))
    assert fresh_cfg.DATASET.NAME == "cityscapes"
    assert fresh_cfg.MODEL.MODEL_NAME == "DeepLabV3_Plus"
    assert fresh_cfg.SOLVER.LR == 0.01
    assert list(fresh_cfg.TEST.SCALES) == [0.75, 1.0, 1.25]


def test_freeze(fresh_cfg):
    fresh_cfg.freeze()
    with pytest.raises(AttributeError):
        fresh_cfg.SEED = 7
    with pytest.raises(AttributeError):
        fresh_cfg.MODEL.BACKBONE = "x"
    fresh_cfg.defrost()
    fresh_cfg.SEED = 7
    assert fresh_cfg.SEED == 7


def test_dump_roundtrip():
    c = SegmentronConfig({"A": {"B": [1, 2]}, "C": 1.5})
    import yaml

    loaded = yaml.safe_load(c.dump())
    assert loaded == {"A": {"B": [1, 2]}, "C": 1.5}


def test_tri_state_int8_knob_cli_coercion(fresh_cfg):
    """TPU.INT8_ACTIVATIONS is bool-by-default but accepts the mode
    strings "pw"/"full" from CLI opts and YAML (the bench default mode
    must be settable via tools/eval.py KEY VALUE overrides)."""
    fresh_cfg.update_from_list(["TPU.INT8_ACTIVATIONS", "pw"])
    assert fresh_cfg.TPU.INT8_ACTIVATIONS == "pw"
    fresh_cfg.update_from_list(["TPU.INT8_ACTIVATIONS", "none"])
    assert not fresh_cfg.TPU.INT8_ACTIVATIONS
    fresh_cfg.update_from_list(["TPU.INT8_ACTIVATIONS", "full"])
    assert fresh_cfg.TPU.INT8_ACTIVATIONS == "full"
    fresh_cfg.update_from_list(["TPU.INT8_ACTIVATIONS", "false"])
    assert fresh_cfg.TPU.INT8_ACTIVATIONS is False


def test_fused_stem_off_spellings(fresh_cfg):
    """TPU.FUSED_STEM defaults to the mode string "block1"; every CLI
    off-spelling must coerce to False — "none" previously became the
    truthy string "none", which silently enabled the regressive
    stem-only fused mode (review finding, round 3)."""
    assert fresh_cfg.TPU.FUSED_STEM == "block1"
    for off in ("none", "false", "0", "no"):
        fresh_cfg.update_from_list(["TPU.FUSED_STEM", "block1"])
        fresh_cfg.update_from_list(["TPU.FUSED_STEM", off])
        assert fresh_cfg.TPU.FUSED_STEM is False, off
    fresh_cfg.update_from_list(["TPU.FUSED_STEM", "stem"])
    assert fresh_cfg.TPU.FUSED_STEM == "stem"


_CONFIG_DIR = __import__("os").path.join(
    __import__("os").path.dirname(__import__("os").path.dirname(
        __import__("os").path.abspath(__file__))), "configs")
_ALL_YAMLS = sorted(
    f for f in __import__("os").listdir(_CONFIG_DIR) if f.endswith(".yaml")
)


@pytest.mark.parametrize("name", _ALL_YAMLS)
def test_every_shipped_config_loads_and_resolves(fresh_cfg, name):
    """Every YAML in configs/ must merge cleanly against the defaults
    tree (unknown keys / wrong types raise in update_from_file) and its
    model/backbone/dataset names must resolve against the registries —
    a typo'd key or an unregistered name in a shipped config would
    otherwise only surface when a user runs that exact config."""
    import os

    from segmentron_tpu.data.dataloader import datasets
    from segmentron_tpu.models.backbones import BACKBONE_REGISTRY
    from segmentron_tpu.models.model_zoo import MODEL_REGISTRY

    fresh_cfg.update_from_file(os.path.join(_CONFIG_DIR, name))
    assert fresh_cfg.MODEL.MODEL_NAME in MODEL_REGISTRY, (
        f"{name}: model {fresh_cfg.MODEL.MODEL_NAME!r} not registered"
    )
    if fresh_cfg.MODEL.BACKBONE:
        assert fresh_cfg.MODEL.BACKBONE in BACKBONE_REGISTRY, (
            f"{name}: backbone {fresh_cfg.MODEL.BACKBONE!r} not registered"
        )
    ds = fresh_cfg.DATASET.NAME.lower()
    if ds == "coco" and "coco" not in datasets:
        pytest.skip("coco loader unavailable in this environment")
    assert ds in datasets, f"{name}: dataset {ds!r} not registered"
