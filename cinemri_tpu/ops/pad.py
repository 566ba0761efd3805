"""Static padding helpers for denoisers.

All shapes in this framework are static under jit, so pad amounts are plain
Python ints computed at trace time — XLA sees fixed-slice pads (free to fuse),
never dynamic shapes.

Parity targets:
  * ``pad_to_multiple`` / ``unpad`` — NormUnet's pad-to-16 (reference
    reconstruction/models/denoisers/norm_unet.py:76-96,177-201): even split,
    floor on the left, ceil on the right.
  * ``pad_for_mwcnn`` / ``unpad_from_mwcnn`` — MWCNN's pad-to-2^n with the
    odd-dimension asymmetry (reference reconstruction/utils/padding.py:7-70:
    left gets the extra sample when the dim is odd and padding is needed).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp

__all__ = [
    "pad_to_multiple",
    "unpad",
    "pad_for_mwcnn",
    "unpad_from_mwcnn",
]

PadSpec = Tuple[Tuple[int, int], ...]  # ((lo, hi) per padded axis, last axes)


def pad_to_multiple(
    x: jnp.ndarray, multiple: int, axes: Sequence[int]
) -> Tuple[jnp.ndarray, PadSpec]:
    """Zero-pad ``axes`` up to the next multiple of ``multiple``.

    Split is floor-left / ceil-right, matching NormUnet
    (norm_unet.py:81-85 uses ``floor((mult-n)/2)`` / ``ceil((mult-n)/2)``).
    """
    pads = [(0, 0)] * x.ndim
    spec = []
    for ax in axes:
        n = x.shape[ax]
        target = -(-n // multiple) * multiple
        lo = (target - n) // 2
        hi = target - n - lo
        pads[ax % x.ndim] = (lo, hi)
        spec.append((lo, hi))
    return jnp.pad(x, pads), tuple(spec)


def unpad(x: jnp.ndarray, spec: PadSpec, axes: Sequence[int]) -> jnp.ndarray:
    """Inverse of :func:`pad_to_multiple`."""
    sl = [slice(None)] * x.ndim
    for (lo, hi), ax in zip(spec, axes):
        n = x.shape[ax % x.ndim]
        sl[ax % x.ndim] = slice(lo, n - hi)
    return x[tuple(sl)]


def _mwcnn_amounts(n: int, n_scales: int) -> Tuple[int, int]:
    """Reference padding.py:27-45 semantics for one dimension."""
    block = 2 ** n_scales
    if n % block == 0:
        return 0, 0
    n_pad = (n // block + 1) * block - n
    left = n_pad // 2 if n % 2 == 0 else 1 + n_pad // 2
    right = n_pad // 2
    return left, right


def pad_for_mwcnn(
    x: jnp.ndarray, n_scales: int, axes: Sequence[int] = (-2, -1)
) -> Tuple[jnp.ndarray, List[int]]:
    """Pad ``axes`` so each is divisible by ``2**n_scales``.

    Returns the padded array and the reference-format pad list
    ``[last_lo, last_hi, second_last_lo, second_last_hi]``
    (padding.py:47-49 builds it last-axis-first).
    """
    ax2, ax1 = axes  # second-to-last, last
    l1, r1 = _mwcnn_amounts(x.shape[ax1 % x.ndim], n_scales)
    l2, r2 = _mwcnn_amounts(x.shape[ax2 % x.ndim], n_scales)
    pads = [(0, 0)] * x.ndim
    pads[ax1 % x.ndim] = (l1, r1)
    pads[ax2 % x.ndim] = (l2, r2)
    return jnp.pad(x, pads), [l1, r1, l2, r2]


def unpad_from_mwcnn(
    x: jnp.ndarray, pad: Sequence[int], axes: Sequence[int] = (-2, -1)
) -> jnp.ndarray:
    """Inverse of :func:`pad_for_mwcnn` (reference padding.py:53-70)."""
    l1, r1, l2, r2 = pad
    sl = [slice(None)] * x.ndim
    ax2, ax1 = axes
    n1 = x.shape[ax1 % x.ndim]
    n2 = x.shape[ax2 % x.ndim]
    sl[ax1 % x.ndim] = slice(l1, n1 - r1)
    sl[ax2 % x.ndim] = slice(l2, n2 - r2)
    return x[tuple(sl)]
