"""Filesystem helpers (reference: ``segmentron/utils/filesystem.py``)."""

from __future__ import annotations

import errno
import os

__all__ = ["makedirs", "try_import"]


def makedirs(path: str) -> None:
    if not path:
        return
    try:
        os.makedirs(path)
    except OSError as e:
        if e.errno != errno.EEXIST:
            raise


def try_import(module_name: str, message: str = ""):
    """Import a module, raising a helpful error if missing."""
    import importlib

    try:
        return importlib.import_module(module_name)
    except ImportError as e:
        raise ImportError(message or f"{module_name} is required: {e}") from e
