"""Process-aware logging (reference: ``segmentron/utils/logger.py::setup_logger``).

Only JAX process 0 writes by default — the analogue of rank-0 logging in
the torch reference's distributed launcher.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

__all__ = ["setup_logger", "get_logger"]

_LOGGER_NAME = "segmentron_tpu"


def setup_logger(
    name: str = _LOGGER_NAME,
    save_dir: Optional[str] = None,
    distributed_rank: int = 0,
    filename: str = "log.txt",
    mode: str = "w",
) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    logger.handlers.clear()
    if distributed_rank > 0:
        logger.addHandler(logging.NullHandler())
        return logger
    fmt = logging.Formatter(
        "%(asctime)s %(name)s %(levelname)s: %(message)s", datefmt="%Y-%m-%d %H:%M:%S"
    )
    ch = logging.StreamHandler(stream=sys.stdout)
    ch.setFormatter(fmt)
    logger.addHandler(ch)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(save_dir, filename), mode=mode)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def get_logger(name: str = _LOGGER_NAME) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        setup_logger(name)
    return logger
