"""Evaluation entry point (reference: ``tools/eval.py``)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from segmentron_tpu.config import cfg
from segmentron_tpu.engine import Evaluator
from segmentron_tpu.utils import parse_args
from segmentron_tpu.utils.default_setup import default_setup


def main():
    args = parse_args()
    if args.config_file:
        cfg.update_from_file(args.config_file)
    cfg.update_from_list(args.opts or [])
    cfg.PHASE = "test"
    default_setup(args)
    evaluator = Evaluator(args)
    evaluator.eval()


if __name__ == "__main__":
    main()
