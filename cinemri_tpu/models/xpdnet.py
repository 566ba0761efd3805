"""XPDNet: learned cross-domain primal-dual reconstruction.

Parity target: reference reconstruction/models/xpdnet.py:17-542 — a ``'KI'``
domain sequence alternating a k-space correction (default: measurement
residual; a :class:`KSpaceCNN` when ``primal_only=False``) with an
image-space MWCNN over a complex buffer of ``n_primal`` channels.

Buffers are native complex stacks here: image buffer ``(b, t, h, w,
n_primal)`` complex, k-space buffer ``(b, t, c, h, w, n_dual)`` complex —
the reference carries first-n-real/last-n-imag channel packs
(``real_to_complex_multi_ch`` shuffles at every step); real/imag splitting
happens once at each conv entry instead.

Replicated reference quirks (load-bearing for parity):
  * the XF temporal FFT uses the opposite shift-order convention
    (``fft1c_alt``; xpdnet.py:467) but is inverted with the *standard*
    convention (xpdnet.py:501) — not a true inverse for odd t;
  * the image nets are **per-cascade** (xpdnet.py:263-273), unlike
    VarNet/CineNet's shared denoiser — the scan stacks parameters
    (``variable_axes={'params': 0}``) instead of broadcasting them;
  * the xfyf residual adds back the temporal mean of the first
    ``n_primal`` buffer channels only (xpdnet.py:504-509).

One deliberate fix: the reference's 2D path feeds the MWCNN without
padding (xpdnet.py:436-444), crashing for sizes not divisible by
``2**n_scales``; here the 2D path pads/unpads like the XF path does.

I/O: ``masked_kspace (b, t, c, h, w)``, ``mask`` -> ``(b, t, h, w) float32``.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

import jax

from cinemri_tpu.models.denoisers.kspace_cnn import KSpaceCNN
from cinemri_tpu.models.denoisers.mwcnn import MWCNN
from cinemri_tpu.models.denoisers.unet import Unet
from cinemri_tpu.ops.cplx import (
    Complex,
    cmean,
    concat as cconcat,
    crepeat,
    from_channels,
    from_multi_channels,
    to_channels,
    to_multi_channels,
)
from cinemri_tpu.ops.coil import rss_complex
from cinemri_tpu.ops.fft import fft1c_alt, ifft1c, ifft2c
from cinemri_tpu.ops.pad import pad_for_mwcnn, unpad_from_mwcnn
from cinemri_tpu.physics.lowfreq import center_band, mask_center_band
from cinemri_tpu.physics.operators import (
    apply_mask,
    constrain_coil_axis,
    is_line_mask,
    masked_normal_kernel,
    normal_plus_lambda_kernel,
    sens_expand,
    sens_reduce,
)

__all__ = ["XPDNet", "XPDNetBlock", "XPDNetSensitivityModel"]


# (..., n) Complex <-> (..., 2n) real, [re_0..re_n, im_0..im_n]
_split_ri = to_multi_channels
_merge_ri = from_multi_channels


class XPDNetSensitivityModel(nn.Module):
    """XPDNet's sensitivity U-Net (xpdnet.py:17-100): plain residual U-Net
    per coil (no normalization wrapper), then RSS normalization."""

    chans: int
    num_pools: int
    res_connection: bool = True
    coil_axis: str = ""  # tensor-parallel mesh axis (physics.constrain_coil_axis)

    @nn.compact
    def __call__(self, masked_kspace: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        def lowfreq(k, m):
            pad, num_low = center_band(m[None])
            return mask_center_band(cmean(k, axis=0), pad, num_low, axis=-2)

        x = jax.vmap(lowfreq)(masked_kspace, mask)  # (b, c, h, w)
        x = constrain_coil_axis(x, self.coil_axis, dim=1)
        x = ifft2c(x)
        b, c, h, w = x.shape
        r = to_channels(x).reshape(b * c, h, w, 2)
        out = Unet(chans=self.chans, num_pool_layers=self.num_pools)(r)
        if self.res_connection:
            out = out + r
        x = from_channels(out.reshape(b, c, h, w, 2))
        x = constrain_coil_axis(x, self.coil_axis, dim=1)
        x = x / rss_complex(x, axis=1)[:, None]
        return x[:, None]  # (b, 1, c, h, w)


class XPDNetBlock(nn.Module):
    """One K-step + I-step pair (xpdnet.py:330-542), scanned over cascades."""

    n_scales: int = 3
    n_filters_per_scale: Sequence[int] = (16, 32, 64)
    n_convs_per_scale: Sequence[int] = (2, 2, 2)
    n_first_convs: int = 1
    first_conv_n_filters: int = 16
    res: bool = False
    primal_only: bool = True
    n_primal: int = 5
    n_dual: int = 1
    dynamic_type: str = "XF"
    weight_sharing: bool = False
    plane_axis: str = ""  # sequence-parallel mesh axis (see VarNetCascade)
    coil_axis: str = ""  # tensor-parallel mesh axis for the coil dim
    packed: bool = False  # space-to-depth MWCNN (mwcnn.MWCNN.packed)
    dtype: jnp.dtype = jnp.float32  # denoiser activation dtype
    norm_buffers: bool = False  # per-channel buffer normalization (bf16 default)

    def _mwcnn(self, name: str) -> MWCNN:
        return MWCNN(
            in_chans=2 * (self.n_primal + 1),
            out_chans=2 * self.n_primal,
            n_scales=self.n_scales,
            n_filters_per_scale=tuple(self.n_filters_per_scale),
            n_convs_per_scale=tuple(self.n_convs_per_scale),
            n_first_convs=self.n_first_convs,
            first_conv_n_filters=self.first_conv_n_filters,
            res=self.res,
            packed=self.packed,
            dtype=self.dtype,
            name=name,
        )

    def _apply_net(self, planes: jnp.ndarray, name: str) -> jnp.ndarray:
        """pad -> MWCNN -> unpad on (n, a, b, ch) planes (xpdnet.py:474-489).

        With ``norm_buffers`` (the bf16 default) the buffer planes are
        first normalized per channel with f32 stats and denormalized after
        — the NormUnet scale-handling recipe (norm_unet.py:59-74) that
        certifies the other families. The reference feeds MWCNN RAW buffers
        (xpdnet.py:474-489), whose large common-mode component otherwise
        dominates the bf16 (8-bit mantissa) rounding and drowns the
        per-cascade correction signal; f32 runs keep the reference's
        raw-buffer semantics untouched by default. Note this changes the
        function computed (not a pure-rounding variation): checkpoints are
        only portable between runs with the same ``norm_buffers`` setting.
        Certified at the reference's full 150-epoch protocol on two seed
        sets — on the chip bf16+norm converges to exactly the framework's
        own f32 results (ΔSSIM vs torch +0.00069 CPU / +0.00033 chip
        seed set 2; BASELINE.md "XPDNet bf16 (round 4)").
        """
        if self.norm_buffers:
            from cinemri_tpu.models.denoisers.norm_unet import _norm_groups

            ch = planes.shape[-1] // 2  # [re x (n_primal+1), im x (n_primal+1)]
            n_out = ch - 1  # n_primal
            # per-(sample, channel) f32 stats; guard std=0 (e.g. t=1 XF/XT
            # planes are constant after temporal-mean subtraction) -> zeros,
            # not 0/0 NaN
            r, mean, std = _norm_groups(planes, guard_zero_std=True)
            padded, pad = pad_for_mwcnn(r, self.n_scales, axes=(1, 2))
            out = self._mwcnn(name)(padded)
            out = unpad_from_mwcnn(out, pad, axes=(1, 2))
            # output channels are [re(buf_0..n_primal-1), im(...)]: denorm
            # with the matching input-slot stats (the bwd channel at index
            # n_primal of each group has no output twin)
            idx = jnp.asarray(list(range(n_out)) + list(range(ch, ch + n_out)))
            return out * std[..., idx] + mean[..., idx]
        padded, pad = pad_for_mwcnn(planes, self.n_scales, axes=(1, 2))
        out = self._mwcnn(name)(padded)
        return unpad_from_mwcnn(out, pad, axes=(1, 2))

    def _k_step(self, image_buffer, kspace_buffer, ref_kspace, mask, sens_maps):
        """k-domain correction (xpdnet.py:352-403)."""
        head = image_buffer[..., 0][:, :, None]  # (b, t, 1, h, w)
        fwd = apply_mask(sens_expand(head, sens_maps), mask)  # (b, t, c, h, w)
        if not self.primal_only:
            cat = cconcat(
                [kspace_buffer, fwd[..., None], ref_kspace[..., None]], axis=-1
            )
            out = KSpaceCNN(out_chans=2 * self.n_dual, name="kspace_net")(
                _split_ri(cat)
            )
            return _merge_ri(out)
        # measurements_residual (xpdnet.py:295-298): current - reference
        return (fwd - ref_kspace)[..., None]

    def _xfyf(self, buf: jnp.ndarray) -> jnp.ndarray:
        """(b, t, h, w, n_primal+1) complex -> (b, t, h, w, n_primal)."""
        b, t, h, w, ch = buf.shape
        mean = cmean(buf, axis=1, keepdims=True)
        x = buf - mean
        if self.dynamic_type == "XF":
            x = fft1c_alt(x, axis=1)  # alt shift order (xpdnet.py:467)

        # planes: (b*h, w, t, 2ch) and (b*w, h, t, 2ch), channels-last
        xf = _split_ri(x.transpose(0, 2, 3, 1, 4)).reshape(b * h, w, t, 2 * ch)
        yf = _split_ri(x.transpose(0, 3, 2, 1, 4)).reshape(b * w, h, t, 2 * ch)
        if self.plane_axis:
            from jax.sharding import PartitionSpec

            import jax

            spec = PartitionSpec(self.plane_axis)
            xf = jax.lax.with_sharding_constraint(xf, spec)
            yf = jax.lax.with_sharding_constraint(yf, spec)
        if self.weight_sharing:
            xf = self._apply_net(xf, "image_net")
            yf = self._apply_net(yf, "image_net")
        else:
            xf = self._apply_net(xf, "image_net_xf")
            yf = self._apply_net(yf, "image_net_yf")
        n_out = self.n_primal
        xf = _merge_ri(xf.reshape(b, h, w, t, 2 * n_out)).transpose(0, 3, 1, 2, 4)
        yf = _merge_ri(yf.reshape(b, w, h, t, 2 * n_out)).transpose(0, 3, 2, 1, 4)
        out = 0.5 * (xf + yf)

        if self.dynamic_type == "XF":
            # reference inverts with the standard convention (xpdnet.py:501)
            out = ifft1c(out, axis=1)
        # residual: temporal mean of the first n_primal buffer channels
        return out + mean[..., : self.n_primal]

    def _i_step(self, image_buffer, bwd):
        """image-domain correction (xpdnet.py:406-446); ``bwd`` is the
        backward-operator image (b, t, h, w)."""
        buf = cconcat([image_buffer, bwd[..., None]], axis=-1)

        if self.dynamic_type in ("XF", "XT"):
            return self._xfyf(buf)
        if self.dynamic_type == "2D":
            b, t, h, w, ch = buf.shape
            planes = _split_ri(buf).reshape(b * t, h, w, 2 * ch)
            out = self._apply_net(planes, "image_net")
            return _merge_ri(out.reshape(b, t, h, w, 2 * self.n_primal))
        raise ValueError(
            f"dynamic_type {self.dynamic_type} unsupported for XPDNet "
            "(3D is excluded, xpdnet_module.py:100-101)"
        )

    @nn.compact
    def __call__(self, carry, ref_kspace, mask, sens_maps, x_ref, dc_kernel):
        image_buffer, kspace_buffer = carry
        # re-anchor the coil layout inside the scan body (see VarNetCascade)
        sens_maps = constrain_coil_axis(sens_maps, self.coil_axis)
        if dc_kernel is not None and self.primal_only:
            # measurements-residual K-step + backward op collapsed:
            # S^H F⁻¹ m (F S head − k_ref) = N(head) − x_ref — one h-axis
            # matmul, no per-cascade DFTs (physics.soft_dc_image_kernel
            # derivation); the k buffer is dead in this mode and rides the
            # carry unchanged.
            head = image_buffer[..., 0][:, :, None]
            bwd = (
                normal_plus_lambda_kernel(head, dc_kernel, sens_maps, 0.0) - x_ref
            )[:, :, 0]
        else:
            ref_kspace = constrain_coil_axis(ref_kspace, self.coil_axis)
            kspace_buffer = constrain_coil_axis(kspace_buffer, self.coil_axis)
            kspace_buffer = self._k_step(
                image_buffer, kspace_buffer, ref_kspace, mask, sens_maps
            )
            bwd = sens_reduce(
                apply_mask(kspace_buffer[..., 0], mask), sens_maps
            )[:, :, 0]
        image_buffer = self._i_step(image_buffer, bwd)
        return (image_buffer, kspace_buffer), None


class XPDNet(nn.Module):
    """Full dynamic XPDNet (xpdnet.py:171-326)."""

    num_cascades: int = 12
    sens_chans: int = 8
    sens_pools: int = 4
    n_scales: int = 3
    n_filters_per_scale: Sequence[int] = (16, 32, 64)
    n_convs_per_scale: Sequence[int] = (2, 2, 2)
    n_first_convs: int = 1
    first_conv_n_filters: int = 16
    res: bool = False
    primal_only: bool = True
    n_primal: int = 5
    n_dual: int = 1
    dynamic_type: str = "XF"
    weight_sharing: bool = False
    remat: bool = True
    plane_axis: str = ""  # sequence-parallel mesh axis for XT/XF planes
    # tensor-parallel mesh axis for the coil dimension (see VarNet.coil_axis)
    coil_axis: str = ""
    kernel_dc: bool = True  # see VarNet.kernel_dc (primal_only mode only)
    packed: bool = False  # space-to-depth MWCNN conv stacks (exact)
    bf16: bool = False  # bfloat16 denoiser activations (see VarNet.bf16)
    # Per-channel MWCNN buffer normalization (XPDNetBlock._apply_net).
    # None -> on exactly when bf16 is on (the certified combination);
    # force True/False to eval a checkpoint trained with the other setting.
    norm_buffers: bool | None = None
    # cascade-remat checkpoint policy (models.remat.REMAT_POLICIES); exact
    remat_policy: str = ""
    remat_prevent_cse: bool = True

    @nn.compact
    def __call__(self, masked_kspace: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        if self.dynamic_type not in ("2D", "XT", "XF"):
            raise ValueError(
                "XPDNet dynamic_type must be 2D/XT/XF (CRNN is "
                "models.recurrent.XPDNetRNN; 3D is excluded by the reference)"
            )
        masked_kspace = constrain_coil_axis(masked_kspace, self.coil_axis)
        sens_maps = XPDNetSensitivityModel(
            self.sens_chans, self.sens_pools, coil_axis=self.coil_axis,
            name="sens_net"
        )(masked_kspace, mask)
        sens_maps = constrain_coil_axis(sens_maps, self.coil_axis)

        x_ref = sens_reduce(masked_kspace, sens_maps)  # (b, t, 1, h, w)
        image = x_ref[:, :, 0]
        k_buf_size = 1 if self.primal_only else self.n_dual
        image_buffer = crepeat(image[..., None], self.n_primal, axis=-1)
        kspace_buffer = crepeat(masked_kspace[..., None], k_buf_size, axis=-1)

        use_kernel = self.kernel_dc and self.primal_only and is_line_mask(mask)
        dc_kernel = masked_normal_kernel(mask) if use_kernel else None

        from cinemri_tpu.models.remat import wrap_remat

        block = wrap_remat(
            XPDNetBlock, self.remat, self.remat_policy, self.remat_prevent_cse
        )
        scan = nn.scan(
            block,
            variable_axes={"params": 0},  # per-cascade nets (xpdnet.py:263-273)
            split_rngs={"params": True},
            in_axes=(nn.broadcast,) * 5,
            length=self.num_cascades,
        )
        (image_buffer, _), _ = scan(
            n_scales=self.n_scales,
            n_filters_per_scale=tuple(self.n_filters_per_scale),
            n_convs_per_scale=tuple(self.n_convs_per_scale),
            n_first_convs=self.n_first_convs,
            first_conv_n_filters=self.first_conv_n_filters,
            res=self.res,
            primal_only=self.primal_only,
            n_primal=self.n_primal,
            n_dual=self.n_dual,
            dynamic_type=self.dynamic_type,
            weight_sharing=self.weight_sharing,
            plane_axis=self.plane_axis,
            coil_axis=self.coil_axis,
            packed=self.packed,
            dtype=jnp.bfloat16 if self.bf16 else jnp.float32,
            norm_buffers=(
                self.bf16 if self.norm_buffers is None else self.norm_buffers
            ),
            name="cascades",
        )(
            (image_buffer, kspace_buffer),
            masked_kspace,
            mask,
            sens_maps,
            x_ref if use_kernel else None,
            dc_kernel,
        )

        return image_buffer[..., 0].abs()
