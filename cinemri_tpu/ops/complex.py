"""HOST-side complex-layout adapters (reference utils/math.py).

The on-device compute path carries :class:`cinemri_tpu.ops.cplx.Complex`
(re, im) float pairs — complex dtypes never reach the device (see
ops/cplx.py and parallel/mesh.py). This module handles the *host-side*
layouts instead: numpy ``complex64`` at dataset/artifact boundaries, the
reference's trailing real/imag dim of size 2
(reconstruction/utils/math.py:5-79), and its ``2n``-channel multi-complex
packing for XPDNet buffers (math.py:97-135) — used by parity tests and
on-disk interop, never inside jitted model code.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "to_real2",
    "from_real2",
    "complex_abs",
    "complex_abs_sq",
    "split_to_real_channels",
    "merge_real_channels",
]


def to_real2(x: jnp.ndarray) -> jnp.ndarray:
    """complex (...,) -> real (..., 2) stacked layout (reference to_tensor)."""
    return jnp.stack((x.real, x.imag), axis=-1)


def from_real2(x: jnp.ndarray) -> jnp.ndarray:
    """real (..., 2) stacked layout -> complex (...,)."""
    if x.shape[-1] != 2:
        raise ValueError("last dimension must be 2 (real/imag)")
    return (x[..., 0] + 1j * x[..., 1]).astype(jnp.complex64)


def complex_abs(x: jnp.ndarray) -> jnp.ndarray:
    """|x| for native complex input (reference math.py:48-62)."""
    return jnp.abs(x)


def complex_abs_sq(x: jnp.ndarray) -> jnp.ndarray:
    """|x|^2 for native complex input (reference math.py:65-79)."""
    return x.real * x.real + x.imag * x.imag


def split_to_real_channels(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Pack n complex channels into 2n real channels along ``axis``.

    Layout: first n entries are real parts, last n are imaginary parts —
    the reference's ``complex_to_real_multi_ch`` (math.py:121-135), which is
    also what ``torch.repeat_interleave(kspace, n, dim=-1)`` produces when
    seeding XPDNet buffers (xpdnet.py:306-307).
    """
    return jnp.concatenate([x.real, x.imag], axis=axis)


def merge_real_channels(x: jnp.ndarray, n: int, axis: int = -1) -> jnp.ndarray:
    """Inverse of :func:`split_to_real_channels` (reference math.py:97-118)."""
    if x.shape[axis] != 2 * n:
        raise ValueError(f"axis {axis} must have size {2 * n}, got {x.shape[axis]}")
    re, im = jnp.split(x, 2, axis=axis)
    return (re + 1j * im).astype(jnp.complex64)
