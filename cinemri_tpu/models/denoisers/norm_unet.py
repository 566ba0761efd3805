"""Normalized U-Net wrappers over native-complex inputs.

Parity target: reference reconstruction/models/denoisers/norm_unet.py:12-219.
The reference packs the trailing real/imag dim into channels, normalizes the
real-part group and imag-part group separately (mean/std with Bessel
correction over all pixels of the group), pads H/W (and T for 3-D) to
multiples of 16, runs the U-Net, then unwinds everything. Same here, on
native complex input:

  * :class:`NormUnet`   — input ``(n, h, w)`` complex (one complex channel,
    like the reference's ``(n, 1, h, w, 2)``).
  * :class:`NormUnet3D` — input ``(n, t, h, w)`` complex.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from cinemri_tpu.models.denoisers.unet import Unet
from cinemri_tpu.ops.cplx import Complex, from_channels, to_channels
from cinemri_tpu.ops.pad import pad_to_multiple, unpad

__all__ = ["NormUnet", "NormUnet3D"]


def _norm_groups(
    x: jnp.ndarray, guard_zero_std: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Normalize each trailing channel over all other (non-batch) axes.

    Matches norm_unet.py:59-74: per-sample mean and *unbiased* std of the
    real group and the imag group (here: the two trailing channels).

    ``guard_zero_std`` maps a constant plane (std 0) to zeros instead of
    0/0 = NaN — used by the norm_buffers path (our own mode, no reference
    analogue), where XF/XT temporal-mean subtraction makes every plane of
    a single-frame (t=1) volume exactly constant. NormUnet keeps the
    unguarded division: the reference divides the same way, so a constant
    input NaNs identically on both sides (quirk parity).
    """
    axes = tuple(range(1, x.ndim - 1))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    n = 1
    for ax in axes:
        n *= x.shape[ax]
    var = jnp.var(x, axis=axes, keepdims=True) * (n / (n - 1))
    std = jnp.sqrt(var)
    if guard_zero_std:
        std = jnp.where(std == 0, jnp.ones_like(std), std)
    return (x - mean) / std, mean, std


class NormUnet(nn.Module):
    """Reference NormUnet (norm_unet.py:12-114) on Complex (n, h, w)."""

    chans: int
    num_pools: int
    drop_prob: float = 0.0
    deterministic: bool = True
    packed: bool = False  # space-to-depth lane packing (unet.Unet.packed)
    dtype: jnp.dtype = jnp.float32  # conv-stack activation dtype (unet.Unet.dtype)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if not isinstance(x, Complex) or x.ndim != 3:
            raise ValueError(f"expected Complex (n, h, w), got {x}")
        r = to_channels(x)  # (n, h, w, 2)
        r, mean, std = _norm_groups(r)
        r, spec = pad_to_multiple(r, 16, axes=(1, 2))
        r = Unet(
            chans=self.chans,
            num_pool_layers=self.num_pools,
            in_chans=2,
            out_chans=2,
            drop_prob=self.drop_prob,
            dims=2,
            deterministic=self.deterministic,
            packed=self.packed,
            dtype=self.dtype,
        )(r)
        r = unpad(r, spec, axes=(1, 2))
        r = r * std + mean
        return from_channels(r)


class NormUnet3D(nn.Module):
    """Reference NormUnet3D (norm_unet.py:117-219) on Complex (n, t, h, w)."""

    chans: int
    num_pools: int
    drop_prob: float = 0.0
    deterministic: bool = True
    packed: bool = False  # space-to-depth lane packing (unet.Unet.packed)
    dtype: jnp.dtype = jnp.float32  # conv-stack activation dtype (unet.Unet.dtype)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if not isinstance(x, Complex) or x.ndim != 4:
            raise ValueError(f"expected Complex (n, t, h, w), got {x}")
        r = to_channels(x)  # (n, t, h, w, 2)
        r, mean, std = _norm_groups(r)
        r, spec = pad_to_multiple(r, 16, axes=(1, 2, 3))
        r = Unet(
            chans=self.chans,
            num_pool_layers=self.num_pools,
            in_chans=2,
            out_chans=2,
            drop_prob=self.drop_prob,
            dims=3,
            deterministic=self.deterministic,
            packed=self.packed,
            dtype=self.dtype,
        )(r)
        r = unpad(r, spec, axes=(1, 2, 3))
        r = r * std + mean
        return from_channels(r)
