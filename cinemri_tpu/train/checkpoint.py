"""Orbax checkpointing: save / best-tracking / resume.

Parity target: the reference's Lightning ModelCheckpoint monitoring
``validation_loss`` (min) plus mtime-based latest-checkpoint resume
(train_test_varnet.py:271-283,59-67). Orbax adds what the reference lacks
(SURVEY §5): atomic async saves and restart-safe auto-restore — the TPU
preemption story. The checkpoint tree carries params, optimizer state, the
step counter, epoch, and the PRNG key, so a resumed run is bit-continuous.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager with best-val tracking."""

    def __init__(self, directory: Path, max_to_keep: int = 3, monitor: str = "val_loss"):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=lambda m: m.get(monitor, float("inf")),
            best_mode="min",
        )
        self._mgr = ocp.CheckpointManager(str(self.directory), options=options)

    def save(self, step: int, tree: Dict[str, Any], metrics: Optional[Dict] = None):
        metrics = {k: float(v) for k, v in (metrics or {}).items()}
        self._mgr.save(step, args=ocp.args.StandardSave(tree), metrics=metrics)

    def wait(self):
        self._mgr.wait_until_finished()

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    @property
    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def restore(self, tree_like: Dict[str, Any], step: Optional[int] = None):
        """Restore ``step`` (default: latest) into the structure of ``tree_like``."""
        step = self.latest_step if step is None else step
        if step is None:
            raise FileNotFoundError(f"No checkpoint available in {self.directory}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, tree_like)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def close(self):
        self._mgr.close()
