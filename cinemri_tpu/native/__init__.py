"""Native (C++) calibration library with ctypes bindings.

The reference depends on the BART C toolbox for ESPIRiT calibration
(SURVEY §2a: the only native component in its system). This package keeps
that role native: ``espirit.cc`` is a dependency-free C++ implementation of
the same algorithm as :mod:`cinemri_tpu.data.espirit`, compiled on demand
with the system ``g++`` (a prebuilt ``libcinemri_espirit.so`` is reused when
present) and exposed through ctypes. ``tests/test_native.py`` cross-validates
it against the numpy implementation — the same two-implementation validation
SURVEY §2a prescribes.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = ["espirit_maps_native", "build_library", "library_path"]

_DIR = Path(__file__).parent
_SRC = _DIR / "espirit.cc"
_LIB = _DIR / "libcinemri_espirit.so"
_handle: Optional[ctypes.CDLL] = None


def library_path() -> Path:
    return _LIB


def build_library(force: bool = False) -> Path:
    """Compile espirit.cc with g++ (O2, fPIC, shared)."""
    if _LIB.exists() and not force:
        if _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
            return _LIB
    subprocess.run(
        [
            "g++",
            "-O2",
            "-shared",
            "-fPIC",
            "-std=c++17",
            str(_SRC),
            "-o",
            str(_LIB),
        ],
        check=True,
        capture_output=True,
    )
    return _LIB


def _load() -> ctypes.CDLL:
    global _handle
    if _handle is None:
        build_library()
        _handle = ctypes.CDLL(str(_LIB))
        f32p = ctypes.POINTER(ctypes.c_float)
        _handle.espirit_maps_f32.argtypes = [
            f32p, f32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float,
            f32p, f32p, f32p,
        ]
        _handle.espirit_maps_f32.restype = ctypes.c_int
    return _handle


def espirit_maps_native(
    kspace: np.ndarray,
    calib_size: int = 24,
    kernel_size: int = 6,
    thresh: float = 0.001,
    crop: float = 0.8,
    return_eigenvalues: bool = False,
):
    """C++ ESPIRiT with the same signature/semantics as
    :func:`cinemri_tpu.data.espirit.espirit_maps`."""
    kspace = np.asarray(kspace, np.complex64)
    if kspace.ndim != 3:
        raise ValueError(f"expected (c, h, w) k-space, got {kspace.shape}")
    c, h, w = kspace.shape
    lib = _load()

    kre = np.ascontiguousarray(kspace.real, np.float32)
    kim = np.ascontiguousarray(kspace.imag, np.float32)
    mre = np.zeros((c, h, w), np.float32)
    mim = np.zeros((c, h, w), np.float32)
    eig = np.zeros((h, w), np.float32)

    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    rc = lib.espirit_maps_f32(
        p(kre), p(kim), c, h, w, int(calib_size), int(kernel_size),
        float(thresh), float(crop), p(mre), p(mim), p(eig),
    )
    if rc != 0:
        raise RuntimeError(f"espirit_maps_f32 failed with code {rc}")
    maps = (mre + 1j * mim).astype(np.complex64)
    if return_eigenvalues:
        return maps, eig
    return maps
