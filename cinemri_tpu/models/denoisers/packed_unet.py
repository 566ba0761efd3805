"""Space-to-depth ("packed") execution of the U-Net conv stack.

Why this exists (design.md §9, VERDICT r2 #1): at the reference's
16-channel widths XLA assigns U-Net activations layouts with the channel
dim in the TPU's 128-lane minormost position, so 16 lanes pad to 128 and
every elementwise / InstanceNorm pass pays ~8x its logical HBM traffic on a
bandwidth-bound chip. A Pallas kernel cannot fix a layout problem
(pallas_call forces dense layouts; the conversion copies cost the win), so
the fix is to change the tensors themselves: compute each U-Net level in a
space-to-depth representation that folds 2x2(x2) spatial blocks into the
channel dim until the lane dim is ~128 wide.

The transform is **algebraically exact** and uses the SAME parameters as
the plain :class:`~cinemri_tpu.models.denoisers.unet.Unet`:

  * a k=3 SAME conv becomes a k=3 conv on the packed grid whose dense
    kernel is assembled from the logical kernel through a constant 0/1
    phase map (4x/8x the FLOPs — irrelevant at MFU ~0.3%, the chip is
    HBM-bound);
  * the k=2 s=2 transpose conv becomes a packed transpose conv with a
    per-dim (kernel, stride) of (2,2) for unpacked dims, (1,1) for dims
    that gain a phase, (2,2) with phase routing for dims packed on both
    sides;
  * InstanceNorm = GroupNorm with one group per LOGICAL channel (each
    group = that channel's phase block — identical statistics);
  * 2x avg-pool = crop + reshape-mean in the packed domain (a fused
    reshape chain, no dense materialization);
  * channel packing is c-major (packed index = c * B + phase), so skip
    concatenation in packed space equals logical concatenation.

Because parameter names and shapes are identical, checkpoints / weight
ports / ``torch_style_init`` are interchangeable between the packed and
plain paths, and gradients agree exactly (the kernel assembly is linear).
Exactness is asserted by tests/test_models.py::TestPackedUnet.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

__all__ = [
    "choose_blocks",
    "pack",
    "unpack",
    "PackedConv",
    "PackedConvTranspose",
    "packed_group_norm",
    "packed_avg_pool_2x",
]

Block = Tuple[int, ...]


def block_size(block: Block) -> int:
    b = 1
    for x in block:
        b *= x
    return b


def choose_blocks(
    spatial: Sequence[int],
    chans: int,
    num_pool_layers: int,
    target_lanes: int = 128,
    order: Sequence[int] | None = None,
) -> list:
    """Per-level space-to-depth blocks for a U-Net.

    Level k has ``chans * 2**k`` channels over ``spatial / 2**k`` grids;
    each level packs dims (preferring the trailing spatial dims — h, w —
    first) while the effective channel count stays below ``target_lanes``
    and the dim's size at that level divides the block.

    Blocks may be 1, 2 or 4 per dim (4 covers e.g. CineNet-3D's odd t=15,
    where the time axis can never pack and one spatial dim takes its
    place). Between adjacent levels each dim's block satisfies
    ``child in {parent, parent/2}`` so the decoder transpose conv has
    packed stride 2*child/parent in {1, 2} (the two verified lax
    conventions) and blocks stay monotone with depth.
    """
    d = len(spatial)
    order = list(order) if order is not None else list(range(d - 1, -1, -1))
    blocks = []
    sizes = list(spatial)
    ch = chans
    parent = None
    for level in range(num_pool_layers + 1):
        if parent is None:
            b = [1] * d
            eff = ch
            for cap in (2, 4):  # double in preference order, then escalate
                for dim in order:
                    if eff >= target_lanes:
                        break
                    if b[dim] * 2 <= cap and sizes[dim] % (b[dim] * 2) == 0:
                        eff //= b[dim]
                        b[dim] *= 2
                        eff *= b[dim]
        else:
            # mandatory minimum parent/2 per dim; raise toward parent while
            # below the lane target and the level size divides
            b = [max(p // 2, 1) for p in parent]
            eff = ch * block_size(tuple(b))
            for dim in order:
                while (
                    eff < target_lanes
                    and b[dim] * 2 <= parent[dim]
                    and sizes[dim] % (b[dim] * 2) == 0
                ):
                    b[dim] *= 2
                    eff *= 2
        for dim in range(d):
            if sizes[dim] % b[dim]:
                raise ValueError(
                    f"level {level}: size {sizes[dim]} not divisible by "
                    f"mandatory block {b[dim]} (dim {dim})"
                )
        blocks.append(tuple(b))
        parent = tuple(b)
        sizes = [s // 2 for s in sizes]
        ch *= 2
    return blocks


def pack(x: jnp.ndarray, block: Block) -> jnp.ndarray:
    """(n, *spatial, c) -> (n, *spatial/block, c * prod(block)), c-major."""
    if all(b == 1 for b in block):
        return x
    n = x.shape[0]
    c = x.shape[-1]
    spatial = x.shape[1:-1]
    d = len(block)
    # split each spatial dim into (grid, phase)
    shape = [n]
    for s, b in zip(spatial, block):
        if s % b:
            raise ValueError(f"spatial {spatial} not divisible by block {block}")
        shape += [s // b, b]
    x = x.reshape(shape + [c])
    # (n, g0, p0, g1, p1, ..., c) -> (n, g0, g1, ..., c, p0, p1, ...)
    perm = [0] + [1 + 2 * i for i in range(d)] + [1 + 2 * d] + [2 + 2 * i for i in range(d)]
    x = x.transpose(perm)
    out_spatial = [s // b for s, b in zip(spatial, block)]
    return x.reshape([n] + out_spatial + [c * block_size(block)])


def unpack(x: jnp.ndarray, block: Block) -> jnp.ndarray:
    """Inverse of :func:`pack`."""
    if all(b == 1 for b in block):
        return x
    n = x.shape[0]
    d = len(block)
    grid = x.shape[1:-1]
    B = block_size(block)
    c = x.shape[-1] // B
    x = x.reshape([n] + list(grid) + [c] + list(block))
    # (n, g0, ..., c, p0, ...) -> (n, g0, p0, g1, p1, ..., c)
    perm = [0]
    for i in range(d):
        perm += [1 + i, 2 + d + i]
    perm += [1 + d]
    x = x.transpose(perm)
    return x.reshape([n] + [g * b for g, b in zip(grid, block)] + [c])


@lru_cache(maxsize=None)
def _conv_phase_map(block: Block, ksizes: Tuple[int, ...]) -> np.ndarray:
    """Constant 0/1 map assembling the packed conv kernel.

    Returns M[(k'0..k'd-1 merged later), p_out, p_in, (k0..kd-1)] as an
    ndarray of shape (*kprime, B, B, *ksizes) with
    ``K'[kp, c_in*B+p_in, c_out*B+p_out] = sum_k W[k, c_in, c_out] * M``.
    Per dim with block b and kernel k (SAME, pad (k-1)//2): the output
    phase i tap d reads input offset s = i + d - pad = b*delta + j.
    """
    d = len(block)
    per_dim = []
    for b, k in zip(block, ksizes):
        pad = (k - 1) // 2
        entries = []  # (d, delta, i, j)
        dmin, dmax = 0, 0
        for i in range(b):
            for dd in range(k):
                s = i + dd - pad
                delta, j = s // b, s % b
                entries.append((dd, delta, i, j))
                dmin, dmax = min(dmin, delta), max(dmax, delta)
        kp = dmax - dmin + 1
        m = np.zeros((k, kp, b, b), np.float32)
        for dd, delta, i, j in entries:
            m[dd, delta - dmin, i, j] = 1.0
        per_dim.append((m, kp))
    # combine dims: M_full[kp0..kpd, pout, pin, k0..kd]
    B = block_size(block)
    kprime = tuple(kp for _, kp in per_dim)
    out = np.zeros(kprime + (B, B) + tuple(ksizes), np.float32)
    # iterate dense (small: <= 27*64*27)
    for pout in range(B):
        iph = []
        rem = pout
        for b in reversed(block):
            iph.append(rem % b)
            rem //= b
        iph = iph[::-1]  # phase per dim, c-major order (dim0 slowest)
        for pin in range(B):
            jph = []
            rem = pin
            for b in reversed(block):
                jph.append(rem % b)
                rem //= b
            jph = jph[::-1]
            # product over dims of m[d_i, delta_i, i, j]
            for kidx in np.ndindex(*ksizes):
                for kpidx in np.ndindex(*kprime):
                    val = 1.0
                    for dim in range(d):
                        val *= per_dim[dim][0][kidx[dim], kpidx[dim], iph[dim], jph[dim]]
                        if val == 0.0:
                            break
                    if val != 0.0:
                        out[kpidx + (pout, pin) + kidx] = val
    return out


@lru_cache(maxsize=None)
def _convt_phase_map(block_in: Block, block_out: Block) -> Tuple[np.ndarray, tuple, tuple]:
    """Phase map for the packed k=2 s=2 VALID transpose conv.

    Returns (M[kp..., p_out, p_in, k...], kernel_sizes, strides) with the
    per-dim cases: (1,1) plain convT k2 s2; (1,2) phase-producing 1x1;
    (2,2) stride-2 k2 with in-phase slot routing.

    lax.conv_transpose's VALID k=2 s=2 convention is ``y[2q+i] =
    K[1-i] * x[q]`` (kernel spatially flipped; verified numerically), so
    with stored index d the logical op is y[2q+(1-d)] = K[d] x[q] and the
    packed slot/phase routing is: (1,2): K'[0, jout=1-d, 0] = K[d];
    (2,2): K'[slot=1-jin, jout=1-d, jin] = K[d]. The (1,1) case uses the
    same convention on both sides, so K' = K.
    """
    d = len(block_in)
    per_dim = []
    for bi, bo in zip(block_in, block_out):
        # general per-dim routing for bo in {bi, 2bi} (choose_blocks
        # guarantees this): with the lax flip convention y[2q+i] =
        # K[1-i] x[q], the packed op has stride/kernel s' = 2bi/bo and
        # input (Q, jin) feeds output value index v = 2*jin + i at
        # (rho = v//bo, jout = v%bo), stored at slot s'-1-rho, tap 1-i.
        if bo not in (bi, 2 * bi):
            raise ValueError(f"unsupported convT block pair {(bi, bo)}")
        sp = 2 * bi // bo
        m = np.zeros((2, sp, bo, bi), np.float32)  # (d, slot, jout, jin)
        for jin in range(bi):
            for i in range(2):
                v = 2 * jin + i
                rho, jout = v // bo, v % bo
                m[1 - i, sp - 1 - rho, jout, jin] = 1.0
        per_dim.append((m, sp, sp))
    Bi, Bo = block_size(block_in), block_size(block_out)
    ksizes = tuple(p[1] for p in per_dim)
    strides = tuple(p[2] for p in per_dim)
    out = np.zeros(ksizes + (Bo, Bi) + (2,) * d, np.float32)
    for pout in range(Bo):
        iph, rem = [], pout
        for b in reversed(block_out):
            iph.append(rem % b)
            rem //= b
        iph = iph[::-1]
        for pin in range(Bi):
            jph, rem = [], pin
            for b in reversed(block_in):
                jph.append(rem % b)
                rem //= b
            jph = jph[::-1]
            for kidx in np.ndindex(*((2,) * d)):
                for kpidx in np.ndindex(*ksizes):
                    val = 1.0
                    for dim in range(d):
                        val *= per_dim[dim][0][kidx[dim], kpidx[dim], iph[dim], jph[dim]]
                        if val == 0.0:
                            break
                    if val != 0.0:
                        out[kpidx + (pout, pin) + kidx] = val
    return out, ksizes, strides


_EINSUM_DIMS = "uvw"
_KD = "xyz"


def _assemble(kernel: jnp.ndarray, m: np.ndarray, d: int) -> jnp.ndarray:
    """K'[kp..., cin*Bin, cout*Bout] from W[k..., cin, cout] and the map."""
    kd = _KD[:d]
    kp = _EINSUM_DIMS[:d]
    # W[x,y,z,i,o], M[u,v,w,P,Q,x,y,z] -> K1[u,v,w,i,Q,o,P]
    k1 = jnp.einsum(f"{kd}io,{kp}PQ{kd}->{kp}iQoP", kernel, jnp.asarray(m, kernel.dtype))
    shp = k1.shape
    cin = shp[d] * shp[d + 1]
    cout = shp[d + 2] * shp[d + 3]
    return k1.reshape(shp[:d] + (cin, cout))


def packed_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None,
    block: Block,
    dtype=None,
) -> jnp.ndarray:
    """k-SAME conv on the packed representation (same block in and out)."""
    import jax

    d = len(block)
    ksizes = tuple(kernel.shape[:d])
    m = _conv_phase_map(tuple(block), ksizes)
    kp = m.shape[:d]
    kprime = _assemble(kernel, m, d)
    if dtype is not None:
        x = x.astype(dtype)
        kprime = kprime.astype(dtype)
    pads = [((k - 1) // 2, k - 1 - (k - 1) // 2) for k in kp]
    dn = ("NHWC", "HWIO", "NHWC") if d == 2 else ("NDHWC", "DHWIO", "NDHWC")
    out = jax.lax.conv_general_dilated(
        x, kprime, (1,) * d, pads, dimension_numbers=dn
    )
    if bias is not None:
        out = out + jnp.repeat(bias, block_size(block)).astype(out.dtype)
    return out


def packed_conv_transpose(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None,
    block_in: Block,
    block_out: Block,
    dtype=None,
) -> jnp.ndarray:
    """k=2 s=2 VALID transpose conv: packed block_in -> packed block_out."""
    import jax

    d = len(block_in)
    m, ksizes, strides = _convt_phase_map(tuple(block_in), tuple(block_out))
    kprime = _assemble(kernel, m, d)
    if dtype is not None:
        x = x.astype(dtype)
        kprime = kprime.astype(dtype)
    dn = ("NHWC", "HWIO", "NHWC") if d == 2 else ("NDHWC", "DHWIO", "NDHWC")
    out = jax.lax.conv_transpose(
        x, kprime, strides, "VALID", dimension_numbers=dn
    )
    if bias is not None:
        out = out + jnp.repeat(bias, block_size(block_out)).astype(out.dtype)
    return out


def packed_group_norm(x: jnp.ndarray, logical_channels: int) -> jnp.ndarray:
    """InstanceNorm(affine=False) on the packed rep: one group per logical
    channel (= its contiguous phase block), eps matching unet._instance_norm.
    Statistics in f32; output keeps the activation dtype."""
    dt = x.dtype
    y = nn.GroupNorm(
        num_groups=logical_channels, epsilon=1e-5, use_bias=False, use_scale=False
    )(x.astype(jnp.float32))
    return y.astype(dt)


def packed_avg_pool_2x(
    x: jnp.ndarray, block_in: Block, block_out: Block
) -> jnp.ndarray:
    """2x avg-pool (torch floor semantics) computed entirely in packed space.

    The round-2/3 profiling lesson: the previous unpack -> crop ->
    reshape-mean -> pack chain materialized the DENSE tensor at full
    resolution, whose 16-wide channel dim pays the ~8x lane-padding HBM tax
    this module exists to avoid (cinenet-3D: the crop slice + layout copy
    alone cost ~14 ms/volume). Instead use the phase structure directly:

      * dims packed with block b >= 2: dense s = b*g + p, so the pooled
        pair (2q, 2q+1) shares the grid cell g AND p//2 — the pool is a
        mean over p%2, a pure channel-space reduction on the 128-lane
        tensor (total extent b*G is even, so floor semantics are exact);
      * dims with b == 1: crop the odd tail and mean adjacent grid cells
        (the only dims where torch's floor drop can occur);
      * re-raising a dim's block to ``block_out`` (choose_blocks gives
        child in {parent/2, parent}) pulls the grid parity into the
        slowest slot of that dim's phase: p' = mid*(g%2) + p_mid — one
        transpose at the POOLED resolution, 4-8x smaller than the dense
        full-resolution intermediate it replaces.
    """
    d = len(block_in)
    n = x.shape[0]
    grid = list(x.shape[1 : 1 + d])
    B = block_size(block_in)
    c = x.shape[-1] // B
    # channels -> explicit (c, p0, ..., pd-1) (c-major packing order)
    y = x.reshape([n] + grid + [c] + list(block_in))
    # 1) phase-pool dims with b >= 2: p -> (p//2, p%2), mean over p%2
    for i, b in enumerate(block_in):
        if b == 1:
            continue
        ax = 1 + d + 1 + i
        shape = list(y.shape)
        shape[ax : ax + 1] = [b // 2, 2]
        y = y.reshape(shape).mean(axis=ax + 1)
    mid = tuple(max(b // 2, 1) for b in block_in)
    # 2) grid-pool dims with b == 1: crop odd tail + mean adjacent cells
    for i, b in enumerate(block_in):
        if b != 1:
            continue
        gax = 1 + i
        g = y.shape[gax]
        if g % 2:
            idx = [slice(None)] * y.ndim
            idx[gax] = slice(0, g - 1)
            y = y[tuple(idx)]
        shape = list(y.shape)
        shape[gax : gax + 1] = [shape[gax] // 2, 2]
        y = y.reshape(shape).mean(axis=gax + 1)
    # 3) re-block mid -> block_out: split raised dims' grids, move parity
    # into the phase (slower than the surviving mid phase)
    raised = [i for i in range(d) if block_out[i] != mid[i]]
    for i in raised:
        if block_out[i] != 2 * mid[i]:
            raise ValueError(
                f"unsupported pool re-block {mid[i]} -> {block_out[i]} (dim {i})"
            )
    if raised:
        shape = [n]
        for i in range(d):
            g = y.shape[1 + i]
            shape += [g // 2, 2] if i in raised else [g]
        shape += [c] + list(mid)
        y = y.reshape(shape)
        ptr = 1
        grid_axes, e_axes = [], {}
        for i in range(d):
            grid_axes.append(ptr)
            ptr += 1
            if i in raised:
                e_axes[i] = ptr
                ptr += 1
        c_ax = ptr
        q_axes = [c_ax + 1 + i for i in range(d)]
        perm = [0] + grid_axes + [c_ax]
        for i in range(d):
            if i in raised:
                perm.append(e_axes[i])
            perm.append(q_axes[i])
        y = y.transpose(perm)
    out_grid = list(y.shape[1 : 1 + d])
    return y.reshape([n] + out_grid + [c * block_size(tuple(block_out))])


class PackedConv(nn.Module):
    """Drop-in for ``nn.Conv(features, k, SAME)`` executing in packed space.

    The param tree ("kernel"/"bias", logical shapes, lecun_normal/zeros
    init) is IDENTICAL to nn.Conv's, so pass ``name="Conv_0"`` etc. to make
    packed and plain modules checkpoint-interchangeable.
    """

    features: int
    kernel_size: Tuple[int, ...]
    block: Block
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1] // block_size(self.block)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            tuple(self.kernel_size) + (cin, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,))
            if self.use_bias
            else None
        )
        return packed_conv(x, kernel, bias, self.block, dtype=self.dtype)


class PackedConvTranspose(nn.Module):
    """Drop-in for ``nn.ConvTranspose(features, 2, strides 2, VALID)``."""

    features: int
    block_in: Block
    block_out: Block
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = len(self.block_in)
        cin = x.shape[-1] // block_size(self.block_in)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (2,) * d + (cin, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,))
            if self.use_bias
            else None
        )
        return packed_conv_transpose(
            x, kernel, bias, self.block_in, self.block_out, dtype=self.dtype
        )
