"""Orbax checkpointing: save / best-tracking / resume.

Parity target: the reference's Lightning ModelCheckpoint monitoring
``validation_loss`` (min) plus mtime-based latest-checkpoint resume
(train_test_varnet.py:271-283,59-67). Orbax adds what the reference lacks
(SURVEY §5): atomic async saves and restart-safe auto-restore — the TPU
preemption story. The checkpoint tree carries params, optimizer state, the
step counter, epoch, and the PRNG key, so a resumed run is bit-continuous.

Retention keeps **both** the ``max_to_keep`` best-by-monitor checkpoints
*and* the most recent one (orbax's built-in ``best_fn`` retention alone
would delete the newest checkpoint whenever its metric isn't among the
best, breaking resume). Best-step tracking persists to ``best_steps.json``
in the checkpoint directory so it survives process restarts.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager with best+latest retention."""

    def __init__(self, directory: Path, max_to_keep: int = 3, monitor: str = "val_loss"):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.max_to_keep = max_to_keep
        # retention is managed here (best-k + latest); orbax keeps everything
        self._mgr = ocp.CheckpointManager(
            str(self.directory), options=ocp.CheckpointManagerOptions(max_to_keep=None)
        )
        self._metrics_file = self.directory / "best_steps.json"
        self._metrics: Dict[int, float] = {}
        if self._metrics_file.exists():
            self._metrics = {
                int(k): float(v)
                for k, v in json.loads(self._metrics_file.read_text()).items()
            }

    def _retained(self) -> set:
        """Steps to keep: the max_to_keep best by monitor value + the latest."""
        steps = self._mgr.all_steps()
        if not steps:
            return set()
        by_metric = sorted(
            (s for s in steps if s in self._metrics), key=lambda s: self._metrics[s]
        )
        keep = set(by_metric[: self.max_to_keep])
        keep.add(max(steps))
        # steps saved without metrics (e.g. an explicit final save) are kept
        keep.update(s for s in steps if s not in self._metrics)
        return keep

    def _enforce_retention(self):
        keep = self._retained()
        for s in self._mgr.all_steps():
            if s not in keep:
                self._mgr.delete(s)

    def save(self, step: int, tree: Dict[str, Any], metrics: Optional[Dict] = None):
        if step in self._mgr.all_steps():
            # overwrite (e.g. re-running an epoch after a preemption save)
            self._mgr.delete(step)
            self._metrics.pop(int(step), None)
        self._mgr.save(step, args=ocp.args.StandardSave(tree))
        if metrics and self.monitor in metrics:
            self._metrics[int(step)] = float(metrics[self.monitor])
            self._metrics_file.write_text(
                json.dumps({str(k): v for k, v in self._metrics.items()})
            )
        self._mgr.wait_until_finished()
        self._enforce_retention()

    def wait(self):
        self._mgr.wait_until_finished()

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    @property
    def best_step(self) -> Optional[int]:
        """Best retained step by monitor value (min), else the latest."""
        candidates = [s for s in self._mgr.all_steps() if s in self._metrics]
        if not candidates:
            return self.latest_step
        return min(candidates, key=lambda s: self._metrics[s])

    def restore(self, tree_like: Dict[str, Any], step: Optional[int] = None):
        """Restore ``step`` (default: latest) into the structure of ``tree_like``."""
        step = self.latest_step if step is None else step
        if step is None:
            raise FileNotFoundError(f"No checkpoint available in {self.directory}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, tree_like)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def close(self):
        self._mgr.close()
