"""Export a trained model as a serving artifact (StableHLO + weights).

Usage:
    python tools/export.py --config-file configs/X.yaml \
        TEST.TEST_MODEL_PATH runs/checkpoints/... \
        [--out-dir runs/export/X] [--height 1024 --width 2048]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from segmentron_tpu.config import cfg
from segmentron_tpu.engine import Evaluator
from segmentron_tpu.engine.export import export_model
from segmentron_tpu.utils import get_logger, parse_args
from segmentron_tpu.utils.default_setup import default_setup


def main():
    args = parse_args(
        extra=[
            (("--out-dir",), dict(default="runs/export")),
            (("--height",), dict(type=int, default=None)),
            (("--width",), dict(type=int, default=None)),
            # raw-pixel serving entry: the graph takes uint8 NHWC and
            # normalizes in-graph (true per-new-image throughput — no
            # host normalize, no entry relayout; VERDICT r4 #2)
            (("--uint8",), dict(action="store_true")),
        ]
    )
    if args.config_file:
        cfg.update_from_file(args.config_file)
    cfg.update_from_list(args.opts or [])
    cfg.PHASE = "test"
    default_setup(args)
    logger = get_logger()

    ev = Evaluator(args)  # builds model + loads TEST.TEST_MODEL_PATH
    h = args.height or cfg.TEST.CROP_SIZE or cfg.TRAIN.CROP_SIZE
    w = args.width or h
    out = export_model(
        ev.model,
        ev.variables,
        (1, h, w, 3),
        args.out_dir,
        compute_dtype=jnp.dtype(cfg.TPU.COMPUTE_DTYPE),
        input_dtype=jnp.uint8 if args.uint8 else None,
    )
    logger.info("Exported serving artifact to %s", out)


if __name__ == "__main__":
    main()
