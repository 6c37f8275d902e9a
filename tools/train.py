"""Training entry point (reference: ``tools/train.py``).

Usage:
    python tools/train.py --config-file configs/cityscapes_deeplabv3_plus.yaml \
        [KEY VALUE ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from segmentron_tpu.config import cfg
from segmentron_tpu.engine import Trainer
from segmentron_tpu.utils import parse_args
from segmentron_tpu.utils.default_setup import default_setup


def main():
    args = parse_args()
    if args.config_file:
        cfg.update_from_file(args.config_file)
    cfg.update_from_list(args.opts or [])
    cfg.PHASE = "train"
    rng_key = default_setup(args)
    trainer = Trainer(args, rng_key=rng_key)
    trainer.train()


if __name__ == "__main__":
    main()
