"""Instrumentation: profiling traces, step timing, numerical sanitizers.

The reference's only observability is wall-clock prints around ``fit`` and
the forward (SURVEY §5: no profiler, no sanitizers). This module makes
tracing and NaN detection first-class:

  * :func:`trace` — context manager around ``jax.profiler`` trace capture
    (open the output in TensorBoard / xprof to see per-op TPU timings).
  * :class:`StepTimer` — device-synchronized per-step wall times with
    percentile summaries.
  * :func:`enable_nan_checks` — the functional-world replacement for the
    reference's ``deterministic=True`` belt-and-braces (jax_debug_nans
    re-runs the offending op eagerly and raises at the source).
  * :func:`assert_finite` — host-side pytree finiteness check for use at
    epoch boundaries.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import numpy as np

__all__ = ["trace", "StepTimer", "enable_nan_checks", "assert_finite"]


@contextlib.contextmanager
def trace(log_dir: Path):
    """Capture a jax.profiler trace for the enclosed block."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer; call around device-synchronized work."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync=None):
        """``sync``: optional array to block_until_ready before stopping."""
        if sync is not None:
            jax.block_until_ready(sync)
        self.times.append(time.perf_counter() - self._t0)

    @contextlib.contextmanager
    def step(self):
        self.start()
        try:
            yield
        finally:
            self.stop()

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        t = np.asarray(self.times)
        return {
            "count": float(len(t)),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p90_s": float(np.percentile(t, 90)),
            "min_s": float(t.min()),
            "max_s": float(t.max()),
        }


def enable_nan_checks(enabled: bool = True):
    """Globally raise at the first NaN-producing op (jax_debug_nans)."""
    jax.config.update("jax_debug_nans", enabled)


def assert_finite(tree, name: str = "tree"):
    """Raise with the offending leaf path if any value is non-finite."""
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    for path, leaf in leaves:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}"
            )
