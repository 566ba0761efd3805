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
    """InstanceNorm2d/3d(affine=False) == per-channel GroupNorm, eps=1e-5.

    Statistics always compute in f32 (the cast chain fuses); the output
    keeps the activation dtype so bf16 mode halves HBM traffic end-to-end.
    """
    dt = x.dtype
    y = nn.GroupNorm(
        num_groups=x.shape[-1], epsilon=1e-5, use_bias=False, use_scale=False
    )(x.astype(jnp.float32))
    return y.astype(dt)


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
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from cinemri_tpu.models.remat import tag_conv_out

        k = (3,) * self.dims
        for _ in range(2):
            x = nn.Conv(
                self.out_chans, k, padding="SAME", use_bias=False, dtype=self.dtype
            )(x)
            x = tag_conv_out(x)  # saveable under the "convs" remat policy
            x = _instance_norm(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
            if self.drop_prob > 0:
                x = nn.Dropout(self.drop_prob, deterministic=self.deterministic)(x)
        return x


class TransposeConvBlock(nn.Module):
    """convT(k=2, s=2) -> InstanceNorm -> LeakyReLU (reference unet.py:185-232)."""

    out_chans: int
    dims: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from cinemri_tpu.models.remat import tag_conv_out

        x = nn.ConvTranspose(
            self.out_chans,
            (2,) * self.dims,
            strides=(2,) * self.dims,
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = tag_conv_out(x)  # saveable under the "convs" remat policy
        x = _instance_norm(x)
        return nn.leaky_relu(x, negative_slope=0.2)


class PackedConvBlock(nn.Module):
    """ConvBlock executed in packed (space-to-depth) representation; the
    param tree matches ConvBlock's exactly (see denoisers.packed_unet)."""

    out_chans: int
    dims: int
    block: tuple
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from cinemri_tpu.models.denoisers.packed_unet import (
            PackedConv,
            packed_group_norm,
        )

        from cinemri_tpu.models.remat import tag_conv_out

        for i in range(2):
            x = PackedConv(
                self.out_chans, (3,) * self.dims, self.block,
                use_bias=False, dtype=self.dtype, name=f"Conv_{i}",
            )(x)
            x = tag_conv_out(x)  # saveable under the "convs" remat policy
            x = packed_group_norm(x, self.out_chans)
            x = nn.leaky_relu(x, negative_slope=0.2)
        return x


class PackedTransposeConvBlock(nn.Module):
    """TransposeConvBlock in packed representation (same param tree)."""

    out_chans: int
    block_in: tuple
    block_out: tuple
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from cinemri_tpu.models.denoisers.packed_unet import (
            PackedConvTranspose,
            packed_group_norm,
        )

        from cinemri_tpu.models.remat import tag_conv_out

        x = PackedConvTranspose(
            self.out_chans, self.block_in, self.block_out,
            use_bias=False, dtype=self.dtype, name="ConvTranspose_0",
        )(x)
        x = tag_conv_out(x)  # saveable under the "convs" remat policy
        x = packed_group_norm(x, self.out_chans)
        return nn.leaky_relu(x, negative_slope=0.2)


class Unet(nn.Module):
    """Reference unet.py:6-125. Input/output: (n, *spatial, chans).

    ``packed=True`` runs the numerically identical space-to-depth execution
    (denoisers.packed_unet): channels are widened toward the TPU's 128-lane
    tile by folding 2x spatial blocks into the channel dim per level, which
    removes the ~8x lane-padding HBM tax the 16-channel layouts pay
    (design.md §9; measured 2.4-3.1x on the conv chain). Same parameters,
    same outputs to f32 rounding — checkpoints are interchangeable.
    """

    chans: int = 32
    num_pool_layers: int = 4
    in_chans: int = 2
    out_chans: int = 2
    drop_prob: float = 0.0
    dims: int = 2
    deterministic: bool = True
    packed: bool = False
    # activation compute dtype for the conv stack (norm statistics stay
    # f32; the final output is cast back to f32). bfloat16 halves the HBM
    # bytes of every activation pass on a bandwidth-bound chip.
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim != self.dims + 2:
            raise ValueError(
                f"Unet(dims={self.dims}) expects rank {self.dims + 2}, got {x.shape}"
            )
        if self.packed:
            if self.drop_prob > 0:
                raise NotImplementedError(
                    "packed Unet does not support dropout (the reference "
                    "never enables it)"
                )
            return self._packed_call(x)
        stack = []
        ch = self.chans
        dt = self.dtype
        out = ConvBlock(ch, self.drop_prob, self.dims, self.deterministic, dt)(x)
        stack.append(out)
        out = _avg_pool_2x(out, self.dims)
        for _ in range(self.num_pool_layers - 1):
            ch *= 2
            out = ConvBlock(ch, self.drop_prob, self.dims, self.deterministic, dt)(out)
            stack.append(out)
            out = _avg_pool_2x(out, self.dims)

        out = ConvBlock(ch * 2, self.drop_prob, self.dims, self.deterministic, dt)(out)

        for i in range(self.num_pool_layers):
            skip = stack.pop()
            out = TransposeConvBlock(ch, self.dims, dt)(out)
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
                out = ConvBlock(ch, self.drop_prob, self.dims, self.deterministic, dt)(out)
                ch //= 2
            else:
                out = ConvBlock(ch, self.drop_prob, self.dims, self.deterministic, dt)(out)
                out = nn.Conv(self.out_chans, (1,) * self.dims, dtype=dt)(out)
        return out.astype(jnp.float32)

    def _packed_call(self, x: jnp.ndarray) -> jnp.ndarray:
        """Space-to-depth execution; mirrors __call__ exactly with packed
        ops and explicit submodule names so the param tree is identical."""
        from cinemri_tpu.models.denoisers.packed_unet import (
            PackedConv,
            choose_blocks,
            pack,
            packed_avg_pool_2x,
            unpack,
        )

        spatial = x.shape[1:-1]
        blocks = choose_blocks(spatial, self.chans, self.num_pool_layers)

        n_blk = 0  # ConvBlock auto-name counter parity
        stack = []  # (activation, depth)
        ch = self.chans
        dt = self.dtype
        out = pack(x, blocks[0])
        out = PackedConvBlock(
            ch, self.dims, blocks[0], dt, name=f"ConvBlock_{n_blk}"
        )(out)
        n_blk += 1
        stack.append((out, 0))
        out = packed_avg_pool_2x(out, blocks[0], blocks[1])
        for depth in range(1, self.num_pool_layers):
            ch *= 2
            out = PackedConvBlock(
                ch, self.dims, blocks[depth], dt, name=f"ConvBlock_{n_blk}"
            )(out)
            n_blk += 1
            stack.append((out, depth))
            out = packed_avg_pool_2x(out, blocks[depth], blocks[depth + 1])

        out = PackedConvBlock(
            ch * 2, self.dims, blocks[self.num_pool_layers], dt,
            name=f"ConvBlock_{n_blk}",
        )(out)
        n_blk += 1

        for i in range(self.num_pool_layers):
            skip, depth = stack.pop()
            b_in = blocks[depth + 1]
            b_out = blocks[depth]
            out = PackedTransposeConvBlock(
                ch, b_in, b_out, dt, name=f"TransposeConvBlock_{i}"
            )(out)
            # odd-size fix (reference unet.py:108-121): packed dims are
            # even by construction, so only b=1 dims can need the trailing
            # pad — applied directly on the packed grid
            pads = [(0, 0)]
            for ax in range(1, self.dims + 1):
                pads.append((0, skip.shape[ax] - out.shape[ax]))
            pads.append((0, 0))
            if any(p != (0, 0) for p in pads):
                out = jnp.pad(out, pads)
            out = jnp.concatenate([out, skip], axis=-1)
            out = PackedConvBlock(
                ch, self.dims, b_out, dt, name=f"ConvBlock_{n_blk}"
            )(out)
            n_blk += 1
            if i < self.num_pool_layers - 1:
                ch //= 2
            else:
                out = PackedConv(
                    self.out_chans, (1,) * self.dims, b_out, dtype=dt, name="Conv_0"
                )(out)
        return unpack(out, blocks[0]).astype(jnp.float32)
