"""Shared utilities: path config, instrumentation re-exports."""

from cinemri_tpu.utils.compile_cache import enable_compile_cache
from cinemri_tpu.utils.paths import fetch_dir, DEFAULT_CONFIG

__all__ = ["fetch_dir", "DEFAULT_CONFIG", "enable_compile_cache"]
