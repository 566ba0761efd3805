"""Centered FFT kernels on native complex arrays.

The reference implements centered FFTs on a stacked-real layout with manual
roll-based shifts (reconstruction/utils/fftc.py:5-110). On TPU, XLA has a
native FFT op over ``complex64``, and ``fftshift``/``ifftshift`` lower to
static slices+concats that XLA fuses, so the whole centered transform is a
single fused HLO chain — no custom rolls needed.

Conventions (parity targets, reference file:line):
  * ``fft2c``/``ifft2c``: shift over the last two axes, ortho norm
    (fftc.py:59-110). Forward = fftshift(fft2(ifftshift(x))).
  * ``fft1c``/``ifft1c``: centered 1-D transform along a given axis
    (fftc.py:5-56; the reference hardcodes the second-to-last real axis,
    i.e. the last complex axis).
  * ``fft1c_alt``/``ifft1c_alt``: the *opposite* shift-order convention used
    by XPDNet's temporal FFT (models/xpdnet.py:463-467,497-501:
    ``ifftshift(fft(fftshift(x)))``). For even lengths the two conventions
    coincide; cine data has t=15 (odd), so both must exist.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

__all__ = [
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


def fft1c(x: jnp.ndarray, axis: int = -1, norm: str = "ortho") -> jnp.ndarray:
    """Centered 1-D FFT along ``axis`` (reference fftc.py:5-29)."""
    x = ifftshift(x, axes=axis)
    x = jnp.fft.fft(x, axis=axis, norm=norm)
    return fftshift(x, axes=axis)


def ifft1c(x: jnp.ndarray, axis: int = -1, norm: str = "ortho") -> jnp.ndarray:
    """Centered 1-D inverse FFT along ``axis`` (reference fftc.py:32-56)."""
    x = ifftshift(x, axes=axis)
    x = jnp.fft.ifft(x, axis=axis, norm=norm)
    return fftshift(x, axes=axis)


def fft1c_alt(x: jnp.ndarray, axis: int = -1, norm: str = "ortho") -> jnp.ndarray:
    """Centered 1-D FFT, opposite shift order (reference xpdnet.py:467)."""
    x = fftshift(x, axes=axis)
    x = jnp.fft.fft(x, axis=axis, norm=norm)
    return ifftshift(x, axes=axis)


def ifft1c_alt(x: jnp.ndarray, axis: int = -1, norm: str = "ortho") -> jnp.ndarray:
    """Exact inverse of :func:`fft1c_alt`.

    Note the reference XPDNet does NOT use this as the inverse of its alt
    forward transform — it inverts with the *standard* convention
    (xpdnet.py:501 is ``fftshift(ifft(ifftshift(x)))`` == :func:`ifft1c`),
    which is only a true inverse for even lengths. That mismatch is a model
    quirk replicated inside the XPDNet implementation, not here.
    """
    x = fftshift(x, axes=axis)
    x = jnp.fft.ifft(x, axis=axis, norm=norm)
    return ifftshift(x, axes=axis)


_SPATIAL2: Sequence[int] = (-2, -1)


def fft2c(x: jnp.ndarray, norm: str = "ortho") -> jnp.ndarray:
    """Centered 2-D FFT over the last two axes (reference fftc.py:59-83)."""
    x = ifftshift(x, axes=_SPATIAL2)
    x = jnp.fft.fft2(x, axes=_SPATIAL2, norm=norm)
    return fftshift(x, axes=_SPATIAL2)


def ifft2c(x: jnp.ndarray, norm: str = "ortho") -> jnp.ndarray:
    """Centered 2-D inverse FFT over the last two axes (reference fftc.py:86-110)."""
    x = ifftshift(x, axes=_SPATIAL2)
    x = jnp.fft.ifft2(x, axes=_SPATIAL2, norm=norm)
    return fftshift(x, axes=_SPATIAL2)
