"""Persistent XLA compilation cache.

XLA compiles every (program, shape) pair from scratch per process; the
flagship backward pass alone costs minutes. Enabling jax's persistent
compilation cache makes recompiles across processes (test runs, CLI
invocations, bench scripts) disk hits instead. The reference has no
equivalent concern (torch eager), so this is TPU-framework plumbing, not a
parity item.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

__all__ = ["enable_compile_cache", "host_fingerprint"]

_DEFAULT_DIR = Path(
    os.environ.get("CINEMRI_COMPILE_CACHE", "~/.cache/cinemri_tpu/xla_cache")
).expanduser()


def host_fingerprint() -> str:
    """Short hash of the host CPU's ISA feature set.

    XLA:CPU AOT executables embed the compile machine's features; loading
    one on a host with a different set SIGILLs or segfaults (observed:
    a cache written on an avx512/amx host crashed
    ``compilation_cache.get_executable_and_time`` on a narrower host).
    Scoping the cache directory by this fingerprint makes cross-machine
    cache reuse impossible instead of fatal.
    """
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        import platform

        feats = platform.processor()
    import jax

    salt = f"{feats}|{jax.__version__}|{os.environ.get('XLA_FLAGS', '')}"
    return hashlib.sha1(salt.encode()).hexdigest()[:10]


def enable_compile_cache(cache_dir: Path | str | None = None) -> Path:
    """Point jax at a persistent on-disk compilation cache; idempotent.

    Set ``CINEMRI_COMPILE_CACHE=0`` to disable (e.g. when benchmarking
    compile times themselves).
    """
    import jax

    if os.environ.get("CINEMRI_COMPILE_CACHE") == "0":
        return _DEFAULT_DIR
    path = Path(cache_dir) if cache_dir is not None else _DEFAULT_DIR
    path = path / host_fingerprint()
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    # cache everything: tiny test programs recompile constantly too
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
