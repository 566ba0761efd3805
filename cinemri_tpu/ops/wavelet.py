"""Haar-like DWT / IWT pooling used by MWCNN.

Parity target: reference reconstruction/models/denoisers/mwcnn.py:216-263.
The reference's IWT allocates a zero tensor and scatters four strided
slices into it (with a hardcoded ``.cuda()``, mwcnn.py:257). Here both
transforms are pure reshape/stack arithmetic on channels-last tensors —
XLA fuses them into the surrounding convolutions with no scatter and no
device assumptions.

Layout: channels-last ``(b, h, w, c)``. Channel order of the DWT output is
``[LL, HL, LH, HH]`` blocks (each of width c), matching the reference's
``dim=1`` concat order.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["dwt2", "iwt2"]


def dwt2(x: jnp.ndarray) -> jnp.ndarray:
    """(b, h, w, c) -> (b, h/2, w/2, 4c); reference DWT (mwcnn.py:224-236)."""
    x01 = x[:, 0::2] / 2  # even rows
    x02 = x[:, 1::2] / 2  # odd rows
    x1 = x01[:, :, 0::2]  # (even h, even w)
    x2 = x02[:, :, 0::2]  # (odd h, even w)
    x3 = x01[:, :, 1::2]  # (even h, odd w)
    x4 = x02[:, :, 1::2]  # (odd h, odd w)
    ll = x1 + x2 + x3 + x4
    hl = -x1 - x2 + x3 + x4
    lh = -x1 + x2 - x3 + x4
    hh = x1 - x2 - x3 + x4
    return jnp.concatenate([ll, hl, lh, hh], axis=-1)


def iwt2(x: jnp.ndarray) -> jnp.ndarray:
    """(b, h, w, 4c) -> (b, 2h, 2w, c); reference IWT (mwcnn.py:248-262)."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x1 = x[..., 0 * c : 1 * c] / 2
    x2 = x[..., 1 * c : 2 * c] / 2
    x3 = x[..., 2 * c : 3 * c] / 2
    x4 = x[..., 3 * c : 4 * c] / 2
    a00 = x1 - x2 - x3 + x4  # out[0::2, 0::2]
    a10 = x1 - x2 + x3 - x4  # out[1::2, 0::2]
    a01 = x1 + x2 - x3 - x4  # out[0::2, 1::2]
    a11 = x1 + x2 + x3 + x4  # out[1::2, 1::2]
    # interleave along w: (b, h, w, 2, c) -> (b, h, 2w, c)
    row0 = jnp.stack([a00, a01], axis=3).reshape(b, h, 2 * w, c)
    row1 = jnp.stack([a10, a11], axis=3).reshape(b, h, 2 * w, c)
    # interleave along h: (b, h, 2, 2w, c) -> (b, 2h, 2w, c)
    return jnp.stack([row0, row1], axis=2).reshape(b, 2 * h, 2 * w, c)
