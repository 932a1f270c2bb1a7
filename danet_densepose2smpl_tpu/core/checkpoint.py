"""Checkpoint save/restore with mid-epoch resume (orbax-backed).

Parity: reference `utils/saver.py` (`CheckpointSaver`: model + optimizer +
epoch + batch_idx + total step, latest-checkpoint discovery) and
`utils/data_loader.py` (mid-epoch resume). Because the input permutation is
a pure function of (seed, epoch), the resume record is just scalars
(epoch, batch_idx) — no stored permutation needed.
"""

from __future__ import annotations

import os
from typing import Any, NamedTuple

import jax
import numpy as np
import orbax.checkpoint as ocp


class ResumePoint(NamedTuple):
    epoch: int
    batch_idx: int
    step: int


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, state: Any, resume: ResumePoint, wait: bool = False) -> None:
        payload = {
            "state": state,
            "resume": {
                "epoch": np.asarray(resume.epoch, np.int32),
                "batch_idx": np.asarray(resume.batch_idx, np.int32),
                "step": np.asarray(resume.step, np.int32),
            },
        }
        self._mngr.save(resume.step, args=ocp.args.StandardSave(payload))
        if wait:
            self._mngr.wait_until_finished()

    def latest_step(self):
        return self._mngr.latest_step()

    def restore(self, state_template: Any, step: int | None = None):
        """Returns (state, ResumePoint) or None if no checkpoint exists."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        template = {
            "state": state_template,
            "resume": {
                "epoch": np.asarray(0, np.int32),
                "batch_idx": np.asarray(0, np.int32),
                "step": np.asarray(0, np.int32),
            },
        }
        out = self._mngr.restore(step, args=ocp.args.StandardRestore(template))
        r = out["resume"]
        return out["state"], ResumePoint(int(r["epoch"]), int(r["batch_idx"]), int(r["step"]))

    def close(self):
        self._mngr.wait_until_finished()
        self._mngr.close()


class MetricLogger:
    """JSONL scalar logging (the TensorBoard-scalar equivalent; host-side)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a")

    def log(self, step: int, metrics: dict) -> None:
        import json

        row = {"step": int(step)}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                pass
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()
