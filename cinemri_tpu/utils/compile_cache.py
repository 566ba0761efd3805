"""Persistent XLA compilation cache.

XLA compiles every (program, shape) pair from scratch per process; the
flagship backward pass alone costs minutes. Enabling jax's persistent
compilation cache makes recompiles across processes (test runs, CLI
invocations, bench scripts) disk hits instead. The reference has no
equivalent concern (torch eager), so this is TPU-framework plumbing, not a
parity item.
"""

from __future__ import annotations

import os
from pathlib import Path

__all__ = ["enable_compile_cache"]

_DEFAULT_DIR = Path(
    os.environ.get("CINEMRI_COMPILE_CACHE", "~/.cache/cinemri_tpu/xla_cache")
).expanduser()


def enable_compile_cache(cache_dir: Path | str | None = None) -> Path:
    """Point jax at a persistent on-disk compilation cache; idempotent.

    Set ``CINEMRI_COMPILE_CACHE=0`` to disable (e.g. when benchmarking
    compile times themselves).
    """
    import jax

    if os.environ.get("CINEMRI_COMPILE_CACHE") == "0":
        return _DEFAULT_DIR
    path = Path(cache_dir) if cache_dir is not None else _DEFAULT_DIR
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    # cache everything: tiny test programs recompile constantly too
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
