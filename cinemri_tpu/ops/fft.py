"""Centered Fourier transforms.

Two dispatch paths behind one API:

  * :class:`~cinemri_tpu.ops.cplx.Complex` inputs (the on-device compute
    path) run the transform as a **DFT matrix multiplication** on the MXU:
    the centered transform along one axis is ``y = W_c x`` with
    ``W_c = shift ∘ F ∘ shift⁻¹`` folded into one dense matrix built once
    per (length, direction, convention, norm) and cached. At cine sizes
    (N ≤ 256) a dense N x N matmul batched over all other axes is the
    fastest way to run an FFT on TPU hardware — it is pure MXU work with
    perfect tiling — and it sidesteps TPU backends without complex/FFT
    support entirely. A complex matmul costs 4 real matmuls (3 with the
    Gauss trick — see ``_GAUSS``).
  * numpy / jnp ``complex64`` inputs use the native FFT (host-side
    preprocessing, CPU oracles).

Conventions (parity targets, reference file:line):
  * ``fft2c``/``ifft2c``: shift over the last two axes, ortho norm
    (reconstruction/utils/fftc.py:59-110).
  * ``fft1c``/``ifft1c``: centered 1-D transform along ``axis``
    (fftc.py:5-56).
  * ``fft1c_alt``: XPDNet's opposite shift-order temporal FFT
    (models/xpdnet.py:467); ``ifft1c_alt`` is its true inverse (the
    reference inverts with the standard convention — a model quirk
    replicated in the XPDNet implementation, not here).
"""

from __future__ import annotations

from functools import lru_cache
import jax
import jax.numpy as jnp
import numpy as np

from cinemri_tpu.ops.cplx import Complex

__all__ = [
    "set_dft_precision",
    "fft1c",
    "ifft1c",
    "fft1c_alt",
    "ifft1c_alt",
    "fft2c",
    "ifft2c",
    "fftshift",
    "ifftshift",
]

fftshift = jnp.fft.fftshift
ifftshift = jnp.fft.ifftshift

# Gauss's 3-multiplication complex product trades one matmul for three
# additions; on MXU-bound shapes it is ~25% faster, at slightly different
# rounding. Enabled by default on the matmul path.
_GAUSS = True

# MXU precision of the DFT matmuls. HIGHEST = f32-exact (6 bf16 passes,
# roundtrip error ~3e-7); HIGH = 3 passes, ~30% faster end-to-end, roundtrip
# error ~6e-5 (measured on v5e); DEFAULT (1 bf16 pass, ~8e-3) is too coarse
# for k-space data consistency. Throughput-oriented serving can switch with
# :func:`set_dft_precision`.
_DFT_PRECISION = jax.lax.Precision.HIGHEST


def set_dft_precision(precision) -> None:
    """Set the matmul precision of the Complex-pair DFT path.

    Accepts a ``jax.lax.Precision`` or one of 'highest'/'high'/'default'.
    Callers must re-jit (new trace) for the change to take effect. Also
    settable via the ``CINEMRI_DFT_PRECISION`` environment variable (read
    at import).
    """
    global _DFT_PRECISION
    if isinstance(precision, str):
        precision = {
            "highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT,
        }[precision.lower()]
    _DFT_PRECISION = precision


import os as _os  # noqa: E402

if _os.environ.get("CINEMRI_DFT_PRECISION"):
    set_dft_precision(_os.environ["CINEMRI_DFT_PRECISION"])


@lru_cache(maxsize=None)
def _dft_matrix(n: int, inverse: bool, alt: bool, norm: str):
    """Centered DFT matrix columns: transform of the unit basis vectors."""
    eye = np.eye(n, dtype=np.complex128)
    f = np.fft.ifft if inverse else np.fft.fft
    if not alt:
        # standard centered: fftshift ∘ F ∘ ifftshift (fftc.py:21-27)
        m = np.fft.fftshift(f(np.fft.ifftshift(eye, axes=0), axis=0, norm=norm), axes=0)
    elif not inverse:
        # alt forward: ifftshift ∘ F ∘ fftshift (xpdnet.py:467)
        m = np.fft.ifftshift(f(np.fft.fftshift(eye, axes=0), axis=0, norm=norm), axes=0)
    else:
        # true inverse of the alt forward transform
        fwd = np.fft.ifftshift(
            np.fft.fft(np.fft.fftshift(eye, axes=0), axis=0, norm=norm), axes=0
        )
        m = np.linalg.inv(fwd)
    return (
        np.ascontiguousarray(m.real, dtype=np.float32),
        np.ascontiguousarray(m.imag, dtype=np.float32),
    )


# backend for the Complex-pair DFT: "xla" (tensordot chain) or "pallas"
# (fused VMEM-resident kernel, ops/kernels/dft_pallas.py).
_DFT_BACKEND = "xla"


def set_dft_backend(backend: str) -> None:
    global _DFT_BACKEND
    if backend not in ("xla", "pallas"):
        raise ValueError(f"unknown DFT backend {backend!r}")
    _DFT_BACKEND = backend


def _apply_dft(x: Complex, axis: int, inverse: bool, alt: bool, norm: str) -> Complex:
    n = x.shape[axis]
    wr_np, wi_np = _dft_matrix(n, inverse, alt, norm)
    axis = axis % x.ndim

    if _DFT_BACKEND == "pallas":
        from cinemri_tpu.ops.kernels.dft_pallas import complex_dft_matmul_pallas

        shape = x.shape
        xr = jnp.moveaxis(x.re, axis, -1).reshape(-1, n)
        xi = jnp.moveaxis(x.im, axis, -1).reshape(-1, n)
        yr, yi = complex_dft_matmul_pallas(xr, xi, wr_np, wi_np)
        moved = tuple(shape[a] for a in range(len(shape)) if a != axis) + (n,)
        yr = jnp.moveaxis(yr.reshape(moved), -1, axis)
        yi = jnp.moveaxis(yi.reshape(moved), -1, axis)
        return Complex(yr, yi)

    wr = jnp.asarray(wr_np)
    wi = jnp.asarray(wi_np)

    def mm(w, v):
        # contract v's `axis` with w's column index: y[..., j, ...] = Σ_k w[j,k] v[..., k, ...]
        out = jnp.tensordot(v, w, axes=((axis,), (1,)), precision=_DFT_PRECISION)
        return jnp.moveaxis(out, -1, axis)

    if _GAUSS:
        return _gauss(mm, wr, wi, x)
    yr = mm(wr, x.re) - mm(wi, x.im)
    yi = mm(wr, x.im) + mm(wi, x.re)
    return Complex(yr, yi)


def _gauss(mm, wr, wi, x: Complex) -> Complex:
    """3-matmul complex product: W x with W = wr + i wi."""
    t1 = mm(wr, x.re)
    t2 = mm(wi, x.im)
    t3 = mm(wr + wi, x.re + x.im)
    return Complex(t1 - t2, t3 - t1 - t2)


def _centered(x, axis: int, inverse: bool, alt: bool, norm: str):
    if isinstance(x, Complex):
        return _apply_dft(x, axis, inverse, alt, norm)
    # native complex path (numpy arrays / complex jnp on CPU backends);
    # the alt-inverse case is handled by ifft1c_alt's dense-matrix route
    f = jnp.fft.ifft if inverse else jnp.fft.fft
    if not alt:
        return fftshift(f(ifftshift(x, axes=axis), axis=axis, norm=norm), axes=axis)
    return ifftshift(f(fftshift(x, axes=axis), axis=axis, norm=norm), axes=axis)


def fft1c(x, axis: int = -1, norm: str = "ortho"):
    """Centered 1-D FFT along ``axis`` (reference fftc.py:5-29)."""
    return _centered(x, axis, inverse=False, alt=False, norm=norm)


def ifft1c(x, axis: int = -1, norm: str = "ortho"):
    """Centered 1-D inverse FFT along ``axis`` (reference fftc.py:32-56)."""
    return _centered(x, axis, inverse=True, alt=False, norm=norm)


def fft1c_alt(x, axis: int = -1, norm: str = "ortho"):
    """Centered 1-D FFT, opposite shift order (reference xpdnet.py:467)."""
    return _centered(x, axis, inverse=False, alt=True, norm=norm)


def ifft1c_alt(x, axis: int = -1, norm: str = "ortho"):
    """Exact inverse of :func:`fft1c_alt` (see module docstring)."""
    if isinstance(x, Complex):
        return _apply_dft(x, axis, inverse=True, alt=True, norm=norm)
    # dense-matrix route for exactness on the native path too
    wr, wi = _dft_matrix(x.shape[axis], True, True, norm)
    w = (wr + 1j * wi).astype(np.complex64)
    out = jnp.tensordot(x, jnp.asarray(w), axes=((axis % x.ndim,), (1,)))
    return jnp.moveaxis(out, -1, axis % x.ndim)


def fft2c(x, norm: str = "ortho"):
    """Centered 2-D FFT over the last two axes (reference fftc.py:59-83)."""
    if isinstance(x, Complex):
        return fft1c(fft1c(x, axis=-2, norm=norm), axis=-1, norm=norm)
    x = ifftshift(x, axes=(-2, -1))
    x = jnp.fft.fft2(x, axes=(-2, -1), norm=norm)
    return fftshift(x, axes=(-2, -1))


def ifft2c(x, norm: str = "ortho"):
    """Centered 2-D inverse FFT over the last two axes (fftc.py:86-110)."""
    if isinstance(x, Complex):
        return ifft1c(ifft1c(x, axis=-2, norm=norm), axis=-1, norm=norm)
    x = ifftshift(x, axes=(-2, -1))
    x = jnp.fft.ifft2(x, axes=(-2, -1), norm=norm)
    return fftshift(x, axes=(-2, -1))
