"""CRNN dynamic variants: recurrence over time *and* unrolled iterations.

Parity targets:
  * :class:`VarNetRNN`  — reference reconstruction/models/recurrent_varnet.py:13-150
  * :class:`CineNetRNN` — recurrent_cinenet.py:12-187
  * :class:`XPDNetRNN`  — recurrent_xpdnet.py:14-239

Shared trunk (all three): a bidirectional CRNN over t feeding three
iteration-recurrent conv layers and an output conv, with a residual add onto
the input, then the model family's data-consistency step (soft DC / CG /
primal-dual buffer update). All trunk weights are shared across unrolled
iterations (the reference creates the convs once), and — unlike VarNet —
λ is a single shared parameter, not per-cascade.

TPU-first: VarNet/CineNet iteration recurrences are ``nn.scan`` with
broadcast params carrying ``(image, h0..h3)`` hidden state; the reference's
growing ``net['t%d_x%d']`` dict of Python-loop tensors (with ``.cuda()``
hidden inits) becomes a fixed-size scan carry. XPDNetRNN keeps a Python
loop because its k-space net has *per-iteration* weights when
``primal_only=False`` (recurrent_xpdnet.py:66-73), which cannot be
broadcast; each iteration is rematerialized.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from cinemri_tpu.models.denoisers.crnn import BCRNN, fused_sum_conv, pack2, unpack2
from cinemri_tpu.models.remat import wrap_remat
from cinemri_tpu.models.denoisers.kspace_cnn import KSpaceCNN
from cinemri_tpu.models.varnet import SensitivityModel, lambda_init
from cinemri_tpu.models.xpdnet import XPDNetSensitivityModel, _merge_ri, _split_ri
from cinemri_tpu.ops.cplx import Complex, concat as cconcat, crepeat, from_channels, to_channels
from cinemri_tpu.physics.cg import conj_grad
from cinemri_tpu.physics.operators import (
    apply_mask,
    coil_weight,
    constrain_coil_axis,
    is_line_mask,
    masked_normal_kernel,
    normal_plus_lambda,
    normal_plus_lambda_kernel,
    sens_expand,
    sens_reduce,
    soft_dc,
    soft_dc_image_kernel,
)

__all__ = ["VarNetRNN", "CineNetRNN", "XPDNetRNN", "CRNNTrunk"]


class CRNNTrunk(nn.Module):
    """BCRNN + 3 iteration-recurrent convs + output conv
    (recurrent_varnet.py:49-58,115-147).

    ``x_in``: (t, b, h, w, in_ch); hiddens: h0 (t, b, h, w, chans),
    h1/h2/h3 (t*b, h, w, chans). Returns (correction (t*b, h, w, out_ch),
    new hiddens).
    """

    chans: int
    in_ch: int = 2
    out_ch: int = 2
    dtype: jnp.dtype = jnp.float32
    # (h, w) space-to-depth block — inputs/hiddens/outputs are all packed
    # when set; exact, same params (denoisers.crnn.fused_sum_conv)
    block: tuple = ()

    @nn.compact
    def __call__(self, x_in, hiddens):
        h0, h1, h2, h3 = hiddens
        t, b, hq, wq, _ = x_in.shape
        dt = self.dtype
        blk = self.block or None
        B = 1
        for bb in self.block:
            B *= bb

        x0 = BCRNN(self.chans, dtype=dt, block=self.block,
                   name="bcrnn")(x_in, h0)
        x0f = x0.reshape(t * b, hq, wq, self.chans * B)

        # each conv(x) + conv(h) pair (recurrent_varnet.py:126-141) is one
        # fused conv over concatenated channels — exact math, half the
        # padded MXU passes at chans~16 (see denoisers.crnn.fused_sum_conv)
        x1 = nn.relu(fused_sum_conv(self.chans, 3, "conv1_xh", x0f, h1,
                                    dtype=dt, block=blk))
        x2 = nn.relu(fused_sum_conv(self.chans, 3, "conv2_xh", x1, h2,
                                    dtype=dt, block=blk))
        x3 = nn.relu(fused_sum_conv(self.chans, 3, "conv3_xh", x2, h3,
                                    dtype=dt, block=blk))
        x4 = fused_sum_conv(self.out_ch, 3, "conv4_x", x3, dtype=dt, block=blk)
        return x4.astype(jnp.float32), (x0, x1, x2, x3)


def _zero_hiddens(
    t: int, b: int, h: int, w: int, chans: int, dtype=jnp.float32, block=()
):
    B = 1
    for bb in block:
        B *= bb
    hq, wq = (h // block[0], w // block[1]) if block else (h, w)
    return (
        jnp.zeros((t, b, hq, wq, chans * B), dtype),
        jnp.zeros((t * b, hq, wq, chans * B), dtype),
        jnp.zeros((t * b, hq, wq, chans * B), dtype),
        jnp.zeros((t * b, hq, wq, chans * B), dtype),
    )


def _trunk_block(h: int, w: int, packed: bool, chans: int = 18) -> tuple:
    """Space-to-depth block for the CRNN trunk, sized to the 128-lane TPU
    register width: (2, 2) lifts chans~16-18 to ~64-72 lanes (cutting the
    padded HBM traffic ~4x), but at CineNet-CRNN's chans=64 a (2, 2) block
    would over-pack to 256 lanes — kernel FLOPs 4x denser with no further
    lane benefit — so wide trunks use (1, 2) (128 lanes exactly).
    () when dims are odd or packing is off."""
    if not packed or h % 2 or w % 2:
        return ()
    if chans * 4 <= 128:
        return (2, 2)
    if chans * 2 <= 128:
        return (1, 2)
    return ()


def _image_to_tb(x) -> jnp.ndarray:
    """(b, t, h, w) Complex -> (t, b, h, w, 2) real channels."""
    return to_channels(x.transpose(1, 0, 2, 3))


def _tb_to_image(r: jnp.ndarray):
    """(t, b, h, w, 2) -> (b, t, h, w) Complex."""
    return from_channels(r).transpose(1, 0, 2, 3)


class _VarNetRNNStep(nn.Module):
    chans: int
    dtype: jnp.dtype = jnp.float32
    block: tuple = ()
    coil_axis: str = ""  # tensor-parallel mesh axis for the coil dim

    @nn.compact
    def __call__(self, carry, ref, mask, sens_maps, dc_kernel, rss0=None):
        sens_maps = constrain_coil_axis(sens_maps, self.coil_axis)
        x, hiddens = carry
        b, t, h, w = x.shape
        x_in = _image_to_tb(x)  # (t, b, h, w, 2)
        if self.block:
            x_in = pack2(x_in, self.block)
        x4, hiddens = CRNNTrunk(
            self.chans, dtype=self.dtype, block=self.block, name="trunk"
        )(x_in, hiddens)
        out = x_in.reshape((t * b,) + x_in.shape[2:]) + x4
        if self.block:
            out = unpack2(out, self.block)
        out_img = _tb_to_image(out.reshape(t, b, h, w, 2))

        lam = self.param("lambda_reg", lambda_init, ())
        v = jax.nn.softplus(lam)
        if dc_kernel is None:  # ref is the k-space reference
            ref = constrain_coil_axis(ref, self.coil_axis)
            current_k = sens_expand(out_img[:, :, None], sens_maps)
            dc = soft_dc(current_k, ref, mask, v)
            x_new = sens_reduce(dc, sens_maps)[:, :, 0]
        else:  # ref is the zero-filled image; zero per-cascade DFTs
            x_new = soft_dc_image_kernel(
                out_img[:, :, None], ref, dc_kernel, sens_maps, v, rss_sq=rss0
            )[:, :, 0]
        return (x_new, hiddens), None


class VarNetRNN(nn.Module):
    """VarNet-CRNN hybrid (recurrent_varnet.py:13-150)."""

    num_cascades: int = 12
    sens_chans: int = 8
    sens_pools: int = 4
    chans: int = 18
    remat: bool = True
    # iteration-remat checkpoint policy (models.remat.REMAT_POLICIES); exact
    remat_policy: str = ""
    remat_prevent_cse: bool = True
    kernel_dc: bool = True  # see VarNet.kernel_dc
    packed: bool = False  # space-to-depth sens-model denoiser
    bf16: bool = False  # bfloat16 trunk activations (see VarNet.bf16)
    # override the auto space-to-depth block for the CRNN trunk
    # (default: _trunk_block's 128-lane rule); e.g. (2, 4)
    trunk_block: tuple = ()
    # tensor-parallel mesh axis for the coil dimension (see VarNet.coil_axis)
    coil_axis: str = ""

    @nn.compact
    def __call__(self, ref_kspace: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        dtype = jnp.bfloat16 if self.bf16 else jnp.float32
        ref_kspace = constrain_coil_axis(ref_kspace, self.coil_axis)
        sens_maps = SensitivityModel(
            self.sens_chans, self.sens_pools, packed=self.packed,
            dtype=dtype, coil_axis=self.coil_axis, name="sens_net"
        )(ref_kspace, mask)
        sens_maps = constrain_coil_axis(sens_maps, self.coil_axis)
        x_ref = sens_reduce(ref_kspace, sens_maps)  # (b, t, 1, h, w)
        x = x_ref[:, :, 0]
        b, t, h, w = x.shape
        block = tuple(self.trunk_block) or _trunk_block(h, w, self.packed, self.chans)
        hiddens = _zero_hiddens(t, b, h, w, self.chans, dtype, block)

        use_kernel = self.kernel_dc and is_line_mask(mask)
        dc_kernel = masked_normal_kernel(mask) if use_kernel else None
        rss0 = coil_weight(sens_maps) if use_kernel else None
        ref = x_ref if use_kernel else ref_kspace

        step = wrap_remat(
            _VarNetRNNStep, self.remat, self.remat_policy, self.remat_prevent_cse
        )
        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(nn.broadcast,) * 5,
            length=self.num_cascades,
        )
        (x, _), _ = scan(
            chans=self.chans, dtype=dtype, block=block,
            coil_axis=self.coil_axis, name="iterations"
        )((x, hiddens), ref, mask, sens_maps, dc_kernel, rss0)
        return x.abs()


class _CineNetRNNStep(nn.Module):
    chans: int
    cg_iters: int
    dtype: jnp.dtype = jnp.float32
    block: tuple = ()
    coil_axis: str = ""  # tensor-parallel mesh axis for the coil dim

    @nn.compact
    def __call__(self, carry, x_ref, mask, sens_maps, dc_kernel):
        sens_maps = constrain_coil_axis(sens_maps, self.coil_axis)
        x, hiddens = carry
        b, t, h, w = x.shape
        x_in = _image_to_tb(x)
        if self.block:
            x_in = pack2(x_in, self.block)
        x4, hiddens = CRNNTrunk(
            self.chans, dtype=self.dtype, block=self.block, name="trunk"
        )(x_in, hiddens)
        out = x_in.reshape((t * b,) + x_in.shape[2:]) + x4
        if self.block:
            out = unpack2(out, self.block)
        out_img = _tb_to_image(out.reshape(t, b, h, w, 2))[:, :, None]  # (b,t,1,h,w)

        lam = self.param("lambda_reg", lambda_init, ())
        v = jax.nn.softplus(lam)
        rhs = x_ref + v * out_img  # recurrent_cinenet.py:179-181
        if dc_kernel is None:
            op = lambda z: normal_plus_lambda(z, mask, sens_maps, v)
        else:
            op = lambda z: normal_plus_lambda_kernel(z, dc_kernel, sens_maps, v)
        x_new = conj_grad(op, rhs, out_img, iters=self.cg_iters)
        return (x_new[:, :, 0], hiddens), None


class CineNetRNN(nn.Module):
    """CineNet-CRNN hybrid (recurrent_cinenet.py:12-187); takes precomputed
    sensitivity maps like CineNet."""

    num_cascades: int = 10
    cg_iters: int = 4
    chans: int = 64
    remat: bool = True
    # iteration-remat checkpoint policy (models.remat.REMAT_POLICIES); exact
    remat_policy: str = ""
    remat_prevent_cse: bool = True
    kernel_dc: bool = True  # see CineNet.kernel_dc
    packed: bool = False  # space-to-depth packed CRNN trunk
    bf16: bool = False  # bfloat16 trunk activations (see VarNet.bf16)
    # override the auto space-to-depth block for the CRNN trunk
    # (default: _trunk_block's 128-lane rule); e.g. (2, 4)
    trunk_block: tuple = ()
    # tensor-parallel mesh axis for the coil dimension (see VarNet.coil_axis)
    coil_axis: str = ""

    @nn.compact
    def __call__(
        self, ref_kspace: jnp.ndarray, mask: jnp.ndarray, sens_maps: jnp.ndarray
    ) -> jnp.ndarray:
        dtype = jnp.bfloat16 if self.bf16 else jnp.float32
        ref_kspace = constrain_coil_axis(ref_kspace, self.coil_axis)
        sens_maps = constrain_coil_axis(sens_maps, self.coil_axis)
        x_ref = sens_reduce(ref_kspace, sens_maps)  # (b, t, 1, h, w)
        x = x_ref[:, :, 0]
        b, t, h, w = x.shape
        block = tuple(self.trunk_block) or _trunk_block(h, w, self.packed, self.chans)
        hiddens = _zero_hiddens(t, b, h, w, self.chans, dtype, block)
        dc_kernel = (
            masked_normal_kernel(mask)
            if self.kernel_dc and is_line_mask(mask)
            else None
        )

        step = wrap_remat(
            _CineNetRNNStep, self.remat, self.remat_policy, self.remat_prevent_cse
        )
        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
            length=self.num_cascades,
        )
        (x, _), _ = scan(
            chans=self.chans, cg_iters=self.cg_iters, dtype=dtype, block=block,
            coil_axis=self.coil_axis, name="iterations",
        )((x, hiddens), x_ref, mask, sens_maps, dc_kernel)
        return x.abs()


def _xpdnet_rnn_body(
    carry, ref_kspace, mask, sens_maps, trunk, kspace_net, n_primal,
    x_ref=None, dc_kernel=None, block=(), coil_axis="",
):
    """One K-correction + buffer update + CRNN image correction
    (recurrent_xpdnet.py:89-231). ``trunk`` is a bound CRNNTrunk; ``kspace_net``
    is a bound KSpaceCNN or None for the measurements-residual default.

    With ``dc_kernel`` (measurements-residual mode only): the k-space buffer
    is ``fwd − ref`` and its sole consumer is the backward operator, so the
    whole k-space round trip collapses to ``N(head) − x_ref`` (one h-axis
    matmul, see physics.soft_dc_image_kernel's derivation); the dead k
    buffer rides the carry unchanged.
    """
    image_buffer, kspace_buffer, hiddens = carry
    b, t, h, w, _ = image_buffer.shape
    n = n_primal

    head = image_buffer[..., 0][:, :, None]
    if kspace_net is None and dc_kernel is not None:
        bwd = (
            normal_plus_lambda_kernel(head, dc_kernel, sens_maps, 0.0) - x_ref
        )[:, :, 0]
        buf = cconcat([image_buffer, bwd[..., None]], axis=-1)
        x_in = _split_ri(buf).transpose(1, 0, 2, 3, 4)
        x4, hiddens = trunk(pack2(x_in, block) if block else x_in, hiddens)
        if block:
            x4 = unpack2(x4, block)
        x_res = _split_ri(buf[..., :n]).transpose(1, 0, 2, 3, 4)
        out = x_res.reshape(t * b, h, w, 2 * n) + x4.reshape(t * b, h, w, 2 * n)
        image_buffer = _merge_ri(out.reshape(t, b, h, w, 2 * n)).transpose(1, 0, 2, 3, 4)
        return image_buffer, kspace_buffer, hiddens

    # k-domain correction
    ref_kspace = constrain_coil_axis(ref_kspace, coil_axis)
    kspace_buffer = constrain_coil_axis(kspace_buffer, coil_axis)
    fwd = apply_mask(sens_expand(head, sens_maps), mask)
    if kspace_net is not None:
        cat = cconcat(
            [kspace_buffer, fwd[..., None], ref_kspace[..., None]], axis=-1
        )
        kspace_buffer = _merge_ri(kspace_net(_split_ri(cat)))
    else:
        kspace_buffer = (fwd - ref_kspace)[..., None]

    # image buffer update
    bwd = sens_reduce(apply_mask(kspace_buffer[..., 0], mask), sens_maps)[:, :, 0]
    buf = cconcat([image_buffer, bwd[..., None]], axis=-1)

    # CRNN correction over the buffer channels; residual adds the first
    # n_primal buffer channels back (recurrent_xpdnet.py:220-225)
    x_in = _split_ri(buf).transpose(1, 0, 2, 3, 4)  # (t, b, h, w, 2(n+1))
    x4, hiddens = trunk(pack2(x_in, block) if block else x_in, hiddens)
    if block:
        x4 = unpack2(x4, block)
    x_res = _split_ri(buf[..., :n]).transpose(1, 0, 2, 3, 4)
    out = x_res.reshape(t * b, h, w, 2 * n) + x4.reshape(t * b, h, w, 2 * n)
    image_buffer = _merge_ri(out.reshape(t, b, h, w, 2 * n)).transpose(1, 0, 2, 3, 4)
    return image_buffer, kspace_buffer, hiddens


class _XPDNetRNNStep(nn.Module):
    """Scan step for the all-weights-shared (primal_only) configuration."""

    chans: int
    n_primal: int
    dtype: jnp.dtype = jnp.float32
    block: tuple = ()
    coil_axis: str = ""  # tensor-parallel mesh axis for the coil dim

    @nn.compact
    def __call__(self, carry, ref_kspace, mask, sens_maps, x_ref, dc_kernel):
        sens_maps = constrain_coil_axis(sens_maps, self.coil_axis)
        trunk = CRNNTrunk(
            self.chans,
            in_ch=2 * (self.n_primal + 1),
            out_ch=2 * self.n_primal,
            dtype=self.dtype,
            block=self.block,
            name="trunk",
        )
        carry = _xpdnet_rnn_body(
            carry, ref_kspace, mask, sens_maps, trunk, None, self.n_primal,
            x_ref=x_ref, dc_kernel=dc_kernel, block=self.block,
            coil_axis=self.coil_axis,
        )
        return carry, None


class _XPDNetRNNPackedStep(nn.Module):
    """Kernel-DC scan step carrying the primal buffer in PACKED layout.

    The dense kernel-DC body pays a full-resolution lane-padded repack of
    the (2(n+1))-channel buffer every cascade (split_ri / pack2 / unpack2 /
    merge_ri round trips on a 10-channel, 128-lane-padded tensor — ~20% of
    xpdnet-CRNN latency in the round-3 profile). Because :func:`pack` is
    c-major, packed channel slices ARE logical channel slices, so the
    buffer can live packed across the whole cascade scan: only the head
    slot (2 of 2n real channels) is unpacked for the physics op and only
    the backward-residual (2 channels) is packed per cascade; pack/unpack
    of the full buffer happens once outside the scan. Exact — same trunk
    params, same math, asserted by TestPackedModels[xpdnet-CRNN].
    """

    chans: int
    n_primal: int
    dtype: jnp.dtype = jnp.float32
    block: tuple = ()
    coil_axis: str = ""  # tensor-parallel mesh axis for the coil dim

    @nn.compact
    def __call__(self, carry, sens_maps, x_ref, dc_kernel):
        sens_maps = constrain_coil_axis(sens_maps, self.coil_axis)
        trunk = CRNNTrunk(
            self.chans,
            in_ch=2 * (self.n_primal + 1),
            out_ch=2 * self.n_primal,
            dtype=self.dtype,
            block=self.block,
            name="trunk",
        )
        buf_p, hiddens = carry  # (t, b, hq, wq, 2n*B) real, c-major packed
        t, b, hq, wq, _ = buf_p.shape
        n = self.n_primal
        B = self.block[0] * self.block[1]

        # head = complex buffer slot 0 = real channels {0, n} of the carry
        # (to_multi_channels is re-block-then-im-block, cplx.py:190-193)
        head_re = unpack2(buf_p[..., 0:B], self.block)[..., 0]  # (t,b,h,w)
        head_im = unpack2(buf_p[..., n * B : (n + 1) * B], self.block)[..., 0]
        head = Complex(head_re, head_im).transpose(1, 0, 2, 3)[:, :, None]

        # measurements-residual K-step + backward op, collapsed to image
        # space (see _xpdnet_rnn_body's kernel branch)
        bwd = (
            normal_plus_lambda_kernel(head, dc_kernel, sens_maps, 0.0) - x_ref
        )[:, :, 0]  # (b, t, h, w) Complex
        bwd_re = pack2(bwd.re.transpose(1, 0, 2, 3)[..., None], self.block)
        bwd_im = pack2(bwd.im.transpose(1, 0, 2, 3)[..., None], self.block)

        # packed trunk input == pack2(split_ri(concat(buffer, bwd))):
        # c-major packing makes it a pure channel concat of packed slices
        x_p = jnp.concatenate(
            [buf_p[..., : n * B], bwd_re, buf_p[..., n * B :], bwd_im], axis=-1
        )
        x4, hiddens = trunk(x_p, hiddens)  # (t*b, hq, wq, 2n*B)
        buf_p = buf_p + x4.reshape(t, b, hq, wq, 2 * n * B)
        return (buf_p, hiddens), None


class XPDNetRNN(nn.Module):
    """XPDNet-CRNN hybrid (recurrent_xpdnet.py:14-239): primal-dual buffers
    with a CRNN image correction over the (n_primal+1)-channel buffer.

    With ``primal_only=True`` (the reference's default config) all weights
    are iteration-shared and the unroll is a scanned loop; with
    ``primal_only=False`` the k-space nets have per-iteration weights
    (recurrent_xpdnet.py:66-73), which forces an unrolled Python loop.
    """

    num_cascades: int = 12
    sens_chans: int = 8
    sens_pools: int = 4
    chans: int = 18
    primal_only: bool = True
    n_primal: int = 5
    n_dual: int = 1
    remat: bool = True
    # iteration-remat checkpoint policy (models.remat.REMAT_POLICIES); exact
    remat_policy: str = ""
    remat_prevent_cse: bool = True
    kernel_dc: bool = True  # see VarNet.kernel_dc (primal_only mode only)
    packed: bool = False  # space-to-depth packed CRNN trunk
    bf16: bool = False  # bfloat16 trunk activations (see VarNet.bf16)
    # override the auto space-to-depth block for the CRNN trunk
    # (default: _trunk_block's 128-lane rule); e.g. (2, 4)
    trunk_block: tuple = ()
    # tensor-parallel mesh axis for the coil dimension (see VarNet.coil_axis)
    coil_axis: str = ""

    @nn.compact
    def __call__(self, ref_kspace: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        ref_kspace = constrain_coil_axis(ref_kspace, self.coil_axis)
        sens_maps = XPDNetSensitivityModel(
            self.sens_chans, self.sens_pools, coil_axis=self.coil_axis,
            name="sens_net"
        )(ref_kspace, mask)
        sens_maps = constrain_coil_axis(sens_maps, self.coil_axis)
        x_ref = sens_reduce(apply_mask(ref_kspace, mask), sens_maps)
        image = x_ref[:, :, 0]
        image_buffer = crepeat(image[..., None], self.n_primal, axis=-1)

        b, t, h, w = image.shape
        dtype = jnp.bfloat16 if self.bf16 else jnp.float32
        block = tuple(self.trunk_block) or _trunk_block(h, w, self.packed, self.chans)
        hiddens = _zero_hiddens(t, b, h, w, self.chans, dtype, block)

        if self.primal_only:
            use_kernel = self.kernel_dc and is_line_mask(mask)
            dc_kernel = masked_normal_kernel(mask) if use_kernel else None
            if use_kernel and block:
                # kernel-DC packed mode: carry the buffer packed across the
                # scan (the dead k-space buffer is dropped entirely); one
                # pack here, one unpack after the scan
                buf_p = pack2(
                    _split_ri(image_buffer).transpose(1, 0, 2, 3, 4), block
                )
                step_cls = wrap_remat(
                    _XPDNetRNNPackedStep, self.remat, self.remat_policy,
                    self.remat_prevent_cse,
                )
                scan = nn.scan(
                    step_cls,
                    variable_broadcast="params",
                    split_rngs={"params": False},
                    in_axes=(nn.broadcast,) * 3,
                    length=self.num_cascades,
                )
                (buf_p, _), _ = scan(
                    chans=self.chans, n_primal=self.n_primal, dtype=dtype,
                    block=block, coil_axis=self.coil_axis, name="iterations"
                )((buf_p, hiddens), sens_maps, x_ref, dc_kernel)
                buf = _merge_ri(unpack2(buf_p, block))  # (t,b,h,w,n) Complex
                return buf[..., 0].transpose(1, 0, 2, 3).abs()
            # all weights iteration-shared: scan + remat
            kspace_buffer = crepeat(ref_kspace[..., None], 1, axis=-1)
            carry = (image_buffer, kspace_buffer, hiddens)
            step_cls = wrap_remat(
                _XPDNetRNNStep, self.remat, self.remat_policy,
                self.remat_prevent_cse,
            )
            scan = nn.scan(
                step_cls,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=(nn.broadcast,) * 5,
                length=self.num_cascades,
            )
            carry, _ = scan(
                chans=self.chans, n_primal=self.n_primal, dtype=dtype,
                block=block, coil_axis=self.coil_axis, name="iterations"
            )(carry, ref_kspace, mask, sens_maps, x_ref if use_kernel else None, dc_kernel)
        else:
            # shared trunk, per-iteration k-space nets (recurrent_xpdnet.py:66-73)
            kspace_buffer = crepeat(ref_kspace[..., None], self.n_dual, axis=-1)
            carry = (image_buffer, kspace_buffer, hiddens)
            trunk = CRNNTrunk(
                self.chans,
                in_ch=2 * (self.n_primal + 1),
                out_ch=2 * self.n_primal,
                dtype=dtype,
                block=block,
                name="trunk",
            )
            for i in range(self.num_cascades):
                knet = KSpaceCNN(out_chans=2 * self.n_dual, name=f"kspace_net_{i}")
                carry = _xpdnet_rnn_body(
                    carry, ref_kspace, mask, sens_maps, trunk, knet,
                    self.n_primal, block=block, coil_axis=self.coil_axis,
                )

        return carry[0][..., 0].abs()
