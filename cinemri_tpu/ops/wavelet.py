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

__all__ = ["dwt2", "iwt2", "dwt2_from_packed", "iwt2_to_packed"]


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


def dwt2_from_packed(x: jnp.ndarray) -> jnp.ndarray:
    """DWT whose input is space-to-depth packed with block (2, 2).

    The four dense values of each 2x2 block ARE the packed phases
    (packed channel = c*4 + ph*2 + pw, packed_unet.pack's c-major order),
    so the Haar butterfly is a pure channel-space map with NO spatial
    movement — the dense full-resolution tensor (whose narrow channel dim
    pays the ~8x lane-padding tax, packed_unet.py module docstring) is
    never materialized.

    (b, h/2, w/2, 4c) packed -> (b, h/2, w/2, 4c) dense DWT output
    (identical to ``dwt2(unpack(x, (2, 2)))``, subband order [LL,HL,LH,HH]).
    """
    b, gh, gw, c4 = x.shape
    c = c4 // 4
    y = x.reshape(b, gh, gw, c, 2, 2) / 2
    x1 = y[..., 0, 0]  # (even h, even w)
    x2 = y[..., 1, 0]  # (odd h, even w)
    x3 = y[..., 0, 1]  # (even h, odd w)
    x4 = y[..., 1, 1]  # (odd h, odd w)
    ll = x1 + x2 + x3 + x4
    hl = -x1 - x2 + x3 + x4
    lh = -x1 + x2 - x3 + x4
    hh = x1 - x2 - x3 + x4
    return jnp.concatenate([ll, hl, lh, hh], axis=-1)


def iwt2_to_packed(x: jnp.ndarray) -> jnp.ndarray:
    """IWT whose output is space-to-depth packed with block (2, 2).

    Inverse counterpart of :func:`dwt2_from_packed`: the reconstructed 2x2
    block values are exactly the output phases, so the assembly is a
    channel-space map at the subband resolution.

    (b, h, w, 4c) subbands -> (b, h, w, 4c) packed
    (identical to ``pack(iwt2(x), (2, 2))``).
    """
    b, h, w, c4 = x.shape
    c = c4 // 4
    x1 = x[..., 0 * c : 1 * c] / 2
    x2 = x[..., 1 * c : 2 * c] / 2
    x3 = x[..., 2 * c : 3 * c] / 2
    x4 = x[..., 3 * c : 4 * c] / 2
    a00 = x1 - x2 - x3 + x4  # phase (0, 0)
    a01 = x1 + x2 - x3 - x4  # phase (0, 1)
    a10 = x1 - x2 + x3 - x4  # phase (1, 0)
    a11 = x1 + x2 + x3 + x4  # phase (1, 1)
    # packed channel = c*4 + ph*2 + pw (c-major): stack (c, 4) then merge
    out = jnp.stack([a00, a01, a10, a11], axis=-1)  # (b, h, w, c, 4)
    return out.reshape(b, h, w, 4 * c)
