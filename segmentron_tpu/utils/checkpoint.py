"""Checkpoint save/resume via orbax
(reference: ``segmentron/utils/filesystem.py::save_checkpoint`` +
``TRAIN.RESUME_MODEL_PATH`` manual restart — SURVEY.md §5.4).

Improvements over the reference: the full pytree (params + batch_stats
+ opt_state + step) is checkpointed, and ``restore_latest`` enables
auto-resume-from-latest after a crash.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, tree: Any, wait: bool = False) -> None:
        self._mgr.save(int(step), args=ocp.args.StandardSave(tree))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: int, template: Any) -> Any:
        return self._mgr.restore(
            int(step), args=ocp.args.StandardRestore(template)
        )

    def restore_latest(self, template: Any) -> Optional[Any]:
        step = self.latest_step()
        if step is None:
            return None
        return self.restore(step, template)

    def restore_raw(self, step: Optional[int] = None) -> Optional[Any]:
        """Restore without a template (nested dicts of arrays) — used by
        the Evaluator to pull params/batch_stats out of a full TrainState
        checkpoint without knowing the optimizer tree."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self._mgr.restore(int(step))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
