"""U-Net denoiser (2-D / 3-D) in channels-last layout.

Parity target: reference reconstruction/models/denoisers/unet.py:6-232 —
encoder/decoder with avg-pool downsampling, transpose-conv upsampling, skip
concatenation, InstanceNorm (no affine) + LeakyReLU(0.2), odd-size pad fix
on the upsampling path, ``dims ∈ {2, 3}``.

TPU-first: convolutions are channels-last (XLA's native TPU layout — the
reference's NCHW would force layout transposes on every conv), and
normalization is a fused GroupNorm with one group per channel (identical
math to InstanceNorm with ``affine=False``).

Dropout is accepted for API parity but the reference never enables it
(``drop_prob`` defaults to 0 everywhere and the CLI never sets it); when
nonzero a 'dropout' PRNG collection is required.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["Unet", "ConvBlock", "TransposeConvBlock"]


def _instance_norm(x: jnp.ndarray) -> jnp.ndarray:
    """InstanceNorm2d/3d(affine=False) == per-channel GroupNorm, eps=1e-5."""
    return nn.GroupNorm(
        num_groups=x.shape[-1], epsilon=1e-5, use_bias=False, use_scale=False
    )(x)


def _avg_pool_2x(x: jnp.ndarray, dims: int) -> jnp.ndarray:
    """avg_pool(kernel=2, stride=2) as crop + reshape + mean.

    Bit-identical to a stride-2 window mean with torch's floor semantics on
    odd dims, but built from reshapes and a reduction — ``reduce_window``
    (what ``nn.avg_pool`` lowers to) is unsupported on some TPU backends,
    and XLA fuses this form at least as well.
    """
    if dims == 2:
        b, h, w, c = x.shape
        x = x[:, : h // 2 * 2, : w // 2 * 2]
        return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
    b, t, h, w, c = x.shape
    x = x[:, : t // 2 * 2, : h // 2 * 2, : w // 2 * 2]
    return x.reshape(b, t // 2, 2, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4, 6))


class ConvBlock(nn.Module):
    """Two (conv3 -> InstanceNorm -> LeakyReLU(0.2) -> dropout) stages
    (reference unet.py:128-182)."""

    out_chans: int
    drop_prob: float = 0.0
    dims: int = 2
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = (3,) * self.dims
        for _ in range(2):
            x = nn.Conv(self.out_chans, k, padding="SAME", use_bias=False)(x)
            x = _instance_norm(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
            if self.drop_prob > 0:
                x = nn.Dropout(self.drop_prob, deterministic=self.deterministic)(x)
        return x


class TransposeConvBlock(nn.Module):
    """convT(k=2, s=2) -> InstanceNorm -> LeakyReLU (reference unet.py:185-232)."""

    out_chans: int
    dims: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.ConvTranspose(
            self.out_chans,
            (2,) * self.dims,
            strides=(2,) * self.dims,
            padding="VALID",
            use_bias=False,
        )(x)
        x = _instance_norm(x)
        return nn.leaky_relu(x, negative_slope=0.2)


class Unet(nn.Module):
    """Reference unet.py:6-125. Input/output: (n, *spatial, chans)."""

    chans: int = 32
    num_pool_layers: int = 4
    in_chans: int = 2
    out_chans: int = 2
    drop_prob: float = 0.0
    dims: int = 2
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim != self.dims + 2:
            raise ValueError(
                f"Unet(dims={self.dims}) expects rank {self.dims + 2}, got {x.shape}"
            )
        stack = []
        ch = self.chans
        out = ConvBlock(ch, self.drop_prob, self.dims, self.deterministic)(x)
        stack.append(out)
        out = _avg_pool_2x(out, self.dims)
        for _ in range(self.num_pool_layers - 1):
            ch *= 2
            out = ConvBlock(ch, self.drop_prob, self.dims, self.deterministic)(out)
            stack.append(out)
            out = _avg_pool_2x(out, self.dims)

        out = ConvBlock(ch * 2, self.drop_prob, self.dims, self.deterministic)(out)

        for i in range(self.num_pool_layers):
            skip = stack.pop()
            out = TransposeConvBlock(ch, self.dims)(out)
            # pad trailing edge when the matching encoder level was odd-sized
            # (reference unet.py:108-121 pads right/bottom/temporal-end)
            pads = [(0, 0)]
            for ax in range(1, self.dims + 1):
                pads.append((0, skip.shape[ax] - out.shape[ax]))
            pads.append((0, 0))
            if any(p != (0, 0) for p in pads):
                out = jnp.pad(out, pads)
            out = jnp.concatenate([out, skip], axis=-1)
            if i < self.num_pool_layers - 1:
                out = ConvBlock(ch, self.drop_prob, self.dims, self.deterministic)(out)
                ch //= 2
            else:
                out = ConvBlock(ch, self.drop_prob, self.dims, self.deterministic)(out)
                out = nn.Conv(self.out_chans, (1,) * self.dims)(out)
        return out
