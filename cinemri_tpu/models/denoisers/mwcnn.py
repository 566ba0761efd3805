"""Multi-scale Wavelet CNN (MWCNN), channels-last.

Parity target: reference reconstruction/models/denoisers/mwcnn.py:8-212 —
a U-Net-shaped denoiser whose pooling/unpooling are the Haar DWT/IWT of
:mod:`cinemri_tpu.ops.wavelet`, with per-scale conv stacks, additive skip
connections, optional pre/post conv stages and optional global residual.
Used as XPDNet's image-space denoiser.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from cinemri_tpu.ops.wavelet import dwt2, dwt2_from_packed, iwt2, iwt2_to_packed

__all__ = ["MWCNN", "MWConvBlock"]


class MWConvBlock(nn.Module):
    """conv3 (no bias) -> InstanceNorm -> LeakyReLU(0.2) (mwcnn.py:183-212).

    ``block``: optional space-to-depth block — input/output arrive packed
    and the conv executes packed with the SAME logical parameters
    (denoisers.packed_unet; norm = one group per logical channel). ``dtype``
    as in unet.ConvBlock (norm statistics stay f32).
    """

    n_filters: int
    dtype: jnp.dtype = jnp.float32
    block: tuple = ()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.block:
            from cinemri_tpu.models.denoisers.packed_unet import (
                PackedConv,
                packed_group_norm,
            )

            x = PackedConv(
                self.n_filters, (3, 3), self.block, use_bias=False,
                dtype=self.dtype, name="Conv_0",
            )(x)
            x = packed_group_norm(x, self.n_filters)
            return nn.leaky_relu(x, negative_slope=0.2)
        x = nn.Conv(
            self.n_filters, (3, 3), padding="SAME", use_bias=False,
            dtype=self.dtype,
        )(x)
        dt = x.dtype
        x = nn.GroupNorm(
            num_groups=x.shape[-1], epsilon=1e-5, use_bias=False, use_scale=False
        )(x.astype(jnp.float32)).astype(dt)
        return nn.leaky_relu(x, negative_slope=0.2)


class MWCNN(nn.Module):
    """Reference mwcnn.py:8-179. Input/output: (n, h, w, chans).

    ``h`` and ``w`` must be divisible by ``2**n_scales`` — callers pad with
    :func:`cinemri_tpu.ops.pad.pad_for_mwcnn` (the reference does the same
    in XPDNet's XF/XT path, xpdnet.py:478-480).
    """

    in_chans: int
    out_chans: int
    n_scales: int = 3
    n_filters_per_scale: Sequence[int] = (16, 32, 64)
    n_convs_per_scale: Sequence[int] = (2, 2, 2)
    n_first_convs: int = 1
    first_conv_n_filters: int = 16
    res: bool = False
    # space-to-depth packed execution (exact, same params — see
    # denoisers/packed_unet.py): each grid level above the deepest runs
    # with a (2,2) block so the 16/32-filter conv stacks stop paying the
    # TPU lane-padding HBM tax; DWT/IWT become fused repack transitions
    packed: bool = False
    dtype: jnp.dtype = jnp.float32  # activation dtype (see unet.Unet.dtype)

    def _chans_for(self, i_scale: int, i_conv: int) -> int:
        """Filter count per conv (mwcnn.py:115-135); input chans are implicit
        in channels-last convs."""
        n_filters = self.n_filters_per_scale[i_scale]
        if i_conv == self.n_convs_per_scale[i_scale] * 2 - 1:
            if i_scale == 0:
                n_filters = max(4 * self.first_conv_n_filters, 4 * self.out_chans)
            else:
                n_filters = 4 * self.n_filters_per_scale[i_scale - 1]
        return n_filters

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        block = 2 ** self.n_scales
        if x.shape[1] % block or x.shape[2] % block:
            raise ValueError(
                f"MWCNN needs spatial dims divisible by {block}, got {x.shape}"
            )
        # per-grid-level packing blocks (level g = after g DWTs); the
        # deepest level is already 64-128 channels wide and stays dense
        lvl = [
            (2, 2) if (self.packed and g < self.n_scales) else ()
            for g in range(self.n_scales + 1)
        ]

        from cinemri_tpu.models.denoisers.packed_unet import pack, unpack

        def repack(v, b_from, b_to, fn):
            """DWT/IWT between packed levels without materializing the dense
            full-resolution tensor: with block (2, 2) the 2x2 Haar stencil
            IS the phase block, so the butterfly runs in channel space
            (ops.wavelet.dwt2_from_packed / iwt2_to_packed); any remaining
            grid<->phase movement happens at the coarser resolution."""
            if fn is dwt2:
                v = dwt2_from_packed(v) if b_from else dwt2(v)
                return pack(v, b_to) if b_to else v
            # iwt: unpack (at subband resolution, wide channels) then
            # assemble straight into the packed output representation
            if b_from:
                v = unpack(v, b_from)
            return iwt2_to_packed(v) if b_to else iwt2(v)

        def mb(n_filters, g):
            return MWConvBlock(n_filters, dtype=self.dtype, block=lvl[g])

        cur = pack(x, lvl[0]) if lvl[0] else x
        # first convs (pre-pooling) — mwcnn.py:150-153
        if self.n_first_convs > 0:
            for _ in range(self.n_first_convs):
                cur = mb(self.first_conv_n_filters, 0)(cur)
            first_conv_feature = cur

        # downsampling — mwcnn.py:156-161
        skips = []
        for i_scale in range(self.n_scales):
            cur = repack(cur, lvl[i_scale], lvl[i_scale + 1], dwt2)
            for i_conv in range(self.n_convs_per_scale[i_scale]):
                cur = mb(self._chans_for(i_scale, i_conv), i_scale + 1)(cur)
            skips.append(cur)

        # upsampling — mwcnn.py:164-170
        for i_scale in range(self.n_scales - 1, -1, -1):
            if i_scale != self.n_scales - 1:
                cur = repack(cur, lvl[i_scale + 2], lvl[i_scale + 1], iwt2)
                cur = cur + skips[i_scale]
            n_convs = self.n_convs_per_scale[i_scale]
            for i_conv in range(n_convs, 2 * n_convs):
                is_last_of_net = i_scale == 0 and i_conv == 2 * n_convs - 1
                if is_last_of_net and self.n_first_convs < 1:
                    # plain conv straight to 4*out (mwcnn.py:100-107)
                    if lvl[1]:
                        from cinemri_tpu.models.denoisers.packed_unet import (
                            PackedConv,
                        )

                        cur = PackedConv(
                            4 * self.out_chans, (3, 3), lvl[1],
                            dtype=self.dtype, name="Conv_0",
                        )(cur)
                    else:
                        cur = nn.Conv(
                            4 * self.out_chans, (3, 3), padding="SAME",
                            dtype=self.dtype, name="Conv_0",
                        )(cur)
                else:
                    cur = mb(self._chans_for(i_scale, i_conv), i_scale + 1)(cur)
        cur = repack(cur, lvl[1], lvl[0], iwt2)

        # final convs + skip from the pre-pooling features — mwcnn.py:172-178
        if self.n_first_convs > 0:
            cur = cur + first_conv_feature
            for _ in range(self.n_first_convs - 1):
                cur = mb(self.first_conv_n_filters, 0)(cur)
            if lvl[0]:
                from cinemri_tpu.models.denoisers.packed_unet import PackedConv

                cur = PackedConv(
                    self.out_chans, (3, 3), lvl[0], dtype=self.dtype,
                    name="Conv_0",
                )(cur)
            else:
                cur = nn.Conv(
                    self.out_chans, (3, 3), padding="SAME", use_bias=True,
                    dtype=self.dtype, name="Conv_0",
                )(cur)
        if lvl[0]:
            cur = unpack(cur, lvl[0])
        cur = cur.astype(jnp.float32)
        return x + cur if self.res else cur
