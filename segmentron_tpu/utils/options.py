"""CLI argument parsing (reference: ``segmentron/utils/options.py::parse_args``)."""

from __future__ import annotations

import argparse

__all__ = ["parse_args"]


def parse_args(argv=None, extra=None):
    """``extra``: list of (args_tuple, kwargs_dict) for tool-specific flags."""
    parser = argparse.ArgumentParser(description="SegmenTron-TPU")
    for eargs, ekw in extra or []:
        parser.add_argument(*eargs, **ekw)
    parser.add_argument(
        "--config-file", metavar="FILE", default=None, help="config file path"
    )
    parser.add_argument(
        "--input-img",
        type=str,
        default=None,
        help="input image path for demo",
    )
    parser.add_argument("--log-iter", type=int, default=10, help="log every N iters")
    parser.add_argument(
        "--val-epoch", type=int, default=1, help="run validation every N epochs"
    )
    parser.add_argument(
        "--skip-val", action="store_true", default=False, help="skip validation"
    )
    parser.add_argument(
        "--resume", action="store_true", default=False, help="resume from latest ckpt"
    )
    parser.add_argument(
        "--best",
        action="store_true",
        default=False,
        help="eval: restore the durable best-mIoU checkpoint instead of latest",
    )
    parser.add_argument(
        "opts",
        default=None,
        nargs=argparse.REMAINDER,
        help="config overrides: KEY VALUE pairs",
    )
    return parser.parse_args(argv)
