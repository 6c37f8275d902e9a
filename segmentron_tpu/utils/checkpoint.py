"""Checkpoint save/resume via orbax
(reference: ``segmentron/utils/filesystem.py::save_checkpoint`` +
``TRAIN.RESUME_MODEL_PATH`` manual restart — SURVEY.md §5.4).

Improvements over the reference: the full pytree (params + batch_stats
+ opt_state + step) is checkpointed, and ``restore_latest`` enables
auto-resume-from-latest after a crash.

Best-model semantics (reference ``tools/train.py`` best_model.pth,
SURVEY §5.4): the best checkpoint lives in a SIBLING ``<dir>_best``
manager with ``max_to_keep=1`` so the rotating snapshot manager can
never rotate it out, and ``best_meta.json`` persists the step + mIoU so
best tracking survives resume.
"""

from __future__ import annotations

import json
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
        self._best = None  # lazy — most eval/demo uses never touch it

    # ------------------------------------------------------ best model
    @property
    def best_directory(self) -> str:
        return self.directory.rstrip("/") + "_best"

    def _best_mgr(self) -> ocp.CheckpointManager:
        if self._best is None:
            self._best = ocp.CheckpointManager(
                self.best_directory,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=1, create=True
                ),
            )
        return self._best

    def _best_meta_path(self) -> str:
        return os.path.join(self.best_directory, "best_meta.json")

    def best_meta(self) -> Optional[dict]:
        """``{"step": int, "miou": float}`` of the saved best, or None."""
        try:
            with open(self._best_meta_path()) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def save_best(self, step: int, tree: Any, miou: float) -> None:
        """Durably save the current best model (rotation-immune)."""
        mgr = self._best_mgr()
        mgr.save(int(step), args=ocp.args.StandardSave(tree), force=True)
        mgr.wait_until_finished()
        with open(self._best_meta_path(), "w") as f:
            json.dump({"step": int(step), "miou": float(miou)}, f)

    def restore_best_raw(self) -> Optional[Any]:
        mgr = self._best_mgr()
        step = mgr.latest_step()
        if step is None:
            return None
        return mgr.restore(int(step))

    # ------------------------------------------------------- rotating
    def save(self, step: int, tree: Any, wait: bool = False) -> None:
        step = int(step)
        if step in (self._mgr.all_steps() or []):
            # snapshot epoch + best-save can coincide on the same step;
            # orbax refuses duplicate step dirs — make save idempotent
            return
        self._mgr.save(step, args=ocp.args.StandardSave(tree))
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
