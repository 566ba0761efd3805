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

from cinemri_tpu.ops.wavelet import dwt2, iwt2

__all__ = ["MWCNN", "MWConvBlock"]


class MWConvBlock(nn.Module):
    """conv3 (no bias) -> InstanceNorm -> LeakyReLU(0.2) (mwcnn.py:183-212)."""

    n_filters: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.n_filters, (3, 3), padding="SAME", use_bias=False)(x)
        x = nn.GroupNorm(
            num_groups=x.shape[-1], epsilon=1e-5, use_bias=False, use_scale=False
        )(x)
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

        cur = x
        # first convs (pre-pooling) — mwcnn.py:150-153
        if self.n_first_convs > 0:
            for _ in range(self.n_first_convs):
                cur = MWConvBlock(self.first_conv_n_filters)(cur)
            first_conv_feature = cur

        # downsampling — mwcnn.py:156-161
        skips = []
        for i_scale in range(self.n_scales):
            cur = dwt2(cur)
            for i_conv in range(self.n_convs_per_scale[i_scale]):
                cur = MWConvBlock(self._chans_for(i_scale, i_conv))(cur)
            skips.append(cur)

        # upsampling — mwcnn.py:164-170
        for i_scale in range(self.n_scales - 1, -1, -1):
            if i_scale != self.n_scales - 1:
                cur = iwt2(cur)
                cur = cur + skips[i_scale]
            n_convs = self.n_convs_per_scale[i_scale]
            for i_conv in range(n_convs, 2 * n_convs):
                is_last_of_net = i_scale == 0 and i_conv == 2 * n_convs - 1
                if is_last_of_net and self.n_first_convs < 1:
                    # plain conv straight to 4*out (mwcnn.py:100-107)
                    cur = nn.Conv(4 * self.out_chans, (3, 3), padding="SAME")(cur)
                else:
                    cur = MWConvBlock(self._chans_for(i_scale, i_conv))(cur)
        cur = iwt2(cur)

        # final convs + skip from the pre-pooling features — mwcnn.py:172-178
        if self.n_first_convs > 0:
            cur = cur + first_conv_feature
            for _ in range(self.n_first_convs - 1):
                cur = MWConvBlock(self.first_conv_n_filters)(cur)
            cur = nn.Conv(self.out_chans, (3, 3), padding="SAME", use_bias=True)(cur)
        return x + cur if self.res else cur
