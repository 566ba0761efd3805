"""Fully-sampled low-frequency band detection for sensitivity estimation.

Parity target: reference SensitivityModel.forward (reconstruction/models/
varnet.py:62-71, duplicated at xpdnet.py:76-84):

  * read frame 0 of the mask along the phase-encode axis;
  * ``left``  = index of the last unsampled line left of center,
    ``right`` = index of the first unsampled line right of center;
  * ``num_low_freqs = right - left`` and ``pad = (h - num_low + 1) // 2``;
  * keep only rows ``[pad, pad + num_low)`` of the time-averaged k-space
    (transforms.mask_center, transforms.py:95-108).

The reference computes this with ``torch.nonzero`` (host-driven, dynamic
shapes). Here the band is found with masked max/min reductions and applied
with an iota comparison, so the whole thing stays inside jit with static
shapes — the band edges are traced scalars, never Python ints.

Assumption (inherited from the reference and made explicit): the mask is an
undersampling mask with at least one unsampled line on each side of a
contiguous fully-sampled central band on frame 0.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

__all__ = ["center_band", "mask_center_band", "low_frequency_kspace"]


def center_band(mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return traced ``(pad, num_low_freqs)`` from a ``(b, t, 1, h, 1)`` mask.

    Uses sample 0 / frame 0, like the reference (varnet.py:63-68).
    """
    m = mask[0, 0, 0, :, 0]
    h = m.shape[0]
    cent = h // 2
    idx = jnp.arange(h)
    is_zero = m == 0
    # last zero strictly left of center
    left = jnp.max(jnp.where(is_zero & (idx < cent), idx, -1))
    # first zero at/right of center
    right = jnp.min(jnp.where(is_zero & (idx >= cent), idx, h))
    num_low = right - left
    pad = (h - num_low + 1) // 2
    return pad, num_low


def mask_center_band(
    x: jnp.ndarray, pad: jnp.ndarray, num_low: jnp.ndarray, axis: int = -2
) -> jnp.ndarray:
    """Zero everything outside rows ``[pad, pad+num_low)`` along ``axis``."""
    h = x.shape[axis]
    idx = jnp.arange(h)
    band = (idx >= pad) & (idx < pad + num_low)
    shape = [1] * x.ndim
    shape[axis % x.ndim] = h
    return x * band.reshape(shape).astype(x.dtype)


def low_frequency_kspace(kspace, mask: jnp.ndarray):
    """Time-averaged k-space restricted to the fully-sampled central band.

    Input ``(b, t, c, h, w)`` (Complex or complex array) -> ``(b, c, h, w)``
    (time collapsed), matching varnet.py:70-71.
    """
    from cinemri_tpu.ops.cplx import Complex, cmean

    pad, num_low = center_band(mask)
    x = cmean(kspace, axis=1) if isinstance(kspace, Complex) else jnp.mean(kspace, axis=1)
    return mask_center_band(x, pad, num_low, axis=-2)
