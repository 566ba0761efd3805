"""Dynamic End-to-End Variational Network (VarNet).

Parity target: reference reconstruction/models/varnet.py:14-282 — unrolled
k-space cascades with a learned-λ soft data-consistency step, a learned
sensitivity-map U-Net, and four dynamic regularizer variants (2D / 3D /
XT / XF); the CRNN variant lives in :mod:`cinemri_tpu.models.recurrent`.

TPU-first structure: the cascade loop is an ``nn.scan`` (one traced cascade
body regardless of depth) with the regularizer U-Net's parameters
*broadcast* across cascades — the reference builds one U-Net and reuses it
in every block (varnet.py:138-149), so sharing is semantic parity, and the
per-cascade λ is a single ``(num_cascades,)`` parameter scanned as loop
input. ``remat=True`` rematerializes each cascade in the backward pass,
bounding training memory at one cascade's activations.

I/O: ``masked_kspace (b, t, c, h, w)`` as a :class:`~cinemri_tpu.ops.cplx.Complex`
pair, ``mask (b, t|1, 1, h, 1)`` float32 -> magnitude image ``(b, t, h, w)``
float32.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from cinemri_tpu.models.denoisers.norm_unet import NormUnet, NormUnet3D
from cinemri_tpu.ops.cplx import Complex, cmean
from cinemri_tpu.ops.coil import rss_complex
from cinemri_tpu.ops.fft import fft1c, ifft1c, ifft2c
from cinemri_tpu.physics.lowfreq import center_band, mask_center_band
from cinemri_tpu.physics.operators import (
    coil_weight,
    constrain_coil_axis,
    is_line_mask,
    masked_normal_kernel,
    sens_expand,
    sens_reduce,
    soft_dc,
    soft_dc_image_kernel,
)

__all__ = ["VarNet", "VarNetCascade", "SensitivityModel", "LAMBDA_INIT", "DYNAMIC_TYPES"]

# softplus(LAMBDA_INIT) == 1 (reference varnet.py:176-179)
LAMBDA_INIT = math.log(math.e - 1.0)

DYNAMIC_TYPES = ("2D", "3D", "XT", "XF")


def lambda_init(key, shape, dtype=jnp.float32):
    return jnp.full(shape, LAMBDA_INIT, dtype)


class SensitivityModel(nn.Module):
    """Learned coil-sensitivity estimation (varnet.py:14-86).

    IFFT of the center-band-masked, time-averaged k-space, a per-coil
    NormUnet (coils folded into the batch), then RSS normalization.
    """

    chans: int
    num_pools: int
    packed: bool = False
    dtype: jnp.dtype = jnp.float32
    coil_axis: str = ""  # tensor-parallel mesh axis (physics.constrain_coil_axis)

    @nn.compact
    def __call__(self, masked_kspace: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        def lowfreq(k, m):  # per-sample: (t, c, h, w), (t|1, 1, h, 1)
            pad, num_low = center_band(m[None])
            return mask_center_band(cmean(k, axis=0), pad, num_low, axis=-2)

        x = jax.vmap(lowfreq)(masked_kspace, mask)  # (b, c, h, w)
        x = constrain_coil_axis(x, self.coil_axis, dim=1)
        x = ifft2c(x)
        b, c, h, w = x.shape
        x = NormUnet(
            self.chans, self.num_pools, packed=self.packed, dtype=self.dtype
        )(x.reshape(b * c, h, w))
        x = x.reshape(b, c, h, w)
        x = constrain_coil_axis(x, self.coil_axis, dim=1)
        x = x / rss_complex(x, axis=1)[:, None]
        return x[:, None]  # (b, 1, c, h, w)


class VarNetCascade(nn.Module):
    """One unrolled block (varnet.py:154-282), scanned over cascades.

    ``plane_axis``: optional mesh axis name; when set (inside a
    ``jax.set_mesh`` scope) the XT/XF rotated-plane batches — b·h and b·w
    independent (·, t) images — are shard-constrained over that axis. This
    is the sequence-parallel layout from SURVEY §5: the planes are
    embarrassingly parallel, so the denoiser convs scale across chips with
    no halo exchange; only the cheap temporal FFT and reshapes touch the
    full extent.
    """

    chans: int
    pools: int
    dynamic_type: str = "XF"
    weight_sharing: bool = False
    plane_axis: str = ""
    coil_axis: str = ""  # tensor-parallel mesh axis for the coil dim
    packed: bool = False  # space-to-depth denoisers (unet.Unet.packed)
    dtype: jnp.dtype = jnp.float32  # denoiser activation dtype

    def _xfyf(self, x: jnp.ndarray) -> jnp.ndarray:
        """Rotated-plane regularization (varnet.py:196-241): temporal-mean
        subtraction, optional temporal FFT (XF), per-plane NormUnets on the
        (w,t)- and (h,t)-plane batches, average, inverse FFT, mean restored."""
        b, t, h, w = x.shape
        mean = cmean(x, axis=1, keepdims=True)
        x = x - mean
        if self.dynamic_type == "XF":
            x = fft1c(x, axis=1)

        xf = x.transpose(0, 2, 3, 1).reshape(b * h, w, t)
        yf = x.transpose(0, 3, 2, 1).reshape(b * w, h, t)
        if self.plane_axis:
            from jax.sharding import PartitionSpec

            spec = PartitionSpec(self.plane_axis)
            xf = jax.lax.with_sharding_constraint(xf, spec)
            yf = jax.lax.with_sharding_constraint(yf, spec)
        if self.weight_sharing:
            net = NormUnet(self.chans, self.pools, packed=self.packed,
                           dtype=self.dtype, name="plane_net")
            xf, yf = net(xf), net(yf)
        else:
            xf = NormUnet(self.chans, self.pools, packed=self.packed,
                          dtype=self.dtype, name="net_xf")(xf)
            yf = NormUnet(self.chans, self.pools, packed=self.packed,
                          dtype=self.dtype, name="net_yf")(yf)
        xf = xf.reshape(b, h, w, t).transpose(0, 3, 1, 2)
        yf = yf.reshape(b, w, h, t).transpose(0, 3, 2, 1)
        out = 0.5 * (xf + yf)

        if self.dynamic_type == "XF":
            out = ifft1c(out, axis=1)
        return out + mean

    @nn.compact
    def __call__(self, carry, lam, ref, mask, sens_maps, dc_kernel, rss0=None):
        # Two equivalent cascade forms (see physics.soft_dc_image_kernel):
        #   direct: carry/ref are k-space; per-cascade FFT pair + soft DC
        #   kernel: carry/ref are the combined image; the whole DC leg is
        #           R0*z - a*N(z) + a*x_ref with zero per-cascade DFTs
        # Re-anchor the coil layout inside the scan body: nn.scan's broadcast
        # does not guarantee constraint propagation into the loop.
        sens_maps = constrain_coil_axis(sens_maps, self.coil_axis)
        if dc_kernel is None:
            carry = constrain_coil_axis(carry, self.coil_axis)
            ref = constrain_coil_axis(ref, self.coil_axis)  # k-space reference
            image = sens_reduce(carry, sens_maps)[:, :, 0]  # (b, t, h, w)
        else:
            image = carry[:, :, 0]
        b, t, h, w = image.shape

        if self.dynamic_type in ("XF", "XT"):
            model_out = self._xfyf(image)
        elif self.dynamic_type == "2D":
            # fold t into batch: per-frame static reconstruction
            # (varnet.py:259-268)
            out = NormUnet(self.chans, self.pools, packed=self.packed,
                           dtype=self.dtype, name="net")(
                image.reshape(b * t, h, w)
            )
            model_out = out.reshape(b, t, h, w)
        elif self.dynamic_type == "3D":
            model_out = NormUnet3D(
                self.chans, self.pools, packed=self.packed,
                dtype=self.dtype, name="net"
            )(image)
        else:
            raise ValueError(f"unknown dynamic_type {self.dynamic_type}")

        v = jax.nn.softplus(lam)
        if dc_kernel is None:
            model_term = sens_expand(model_out[:, :, None], sens_maps)
            return soft_dc(model_term, ref, mask, v), None
        return (
            soft_dc_image_kernel(
                model_out[:, :, None], ref, dc_kernel, sens_maps, v, rss_sq=rss0
            ),
            None,
        )


class VarNet(nn.Module):
    """Full dynamic VarNet (varnet.py:91-151)."""

    num_cascades: int = 12
    sens_chans: int = 8
    sens_pools: int = 4
    chans: int = 18
    pools: int = 4
    dynamic_type: str = "XF"
    weight_sharing: bool = False
    remat: bool = True
    plane_axis: str = ""  # sequence-parallel mesh axis for XT/XF planes
    # tensor-parallel mesh axis for the coil dimension: per-coil work
    # (IFFTs, normal-operator matmuls, the sens U-Net's coil-folded batch)
    # shards across chips and the coil-combine reductions become
    # all-reduces (physics.constrain_coil_axis). Requires jax.set_mesh and
    # the xla normal backend.
    coil_axis: str = ""
    # space-to-depth lane packing of every denoiser conv stack — exact,
    # same params (denoisers/packed_unet.py)
    packed: bool = False
    # bfloat16 denoiser activations: params/optimizer/DC/loss stay f32,
    # conv-stack activations halve their HBM bytes. Not bit-exact —
    # quality certified by the bf16 rows of bench/parity_head_to_head.py
    bf16: bool = False
    # image-space cascades through the precomputed DC kernel (see
    # physics.soft_dc_image_kernel) — numerically identical to the direct
    # k-space form; auto-falls back for non-line masks
    kernel_dc: bool = True
    # checkpoint policy for the cascade remat (models.remat.REMAT_POLICIES);
    # numerically exact — changes only what the backward pass recomputes
    remat_policy: str = ""
    remat_prevent_cse: bool = True

    @nn.compact
    def __call__(self, masked_kspace: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        if self.dynamic_type not in DYNAMIC_TYPES:
            raise ValueError(
                f"dynamic_type must be one of {DYNAMIC_TYPES} (CRNN is "
                "models.recurrent.VarNetRNN)"
            )
        dtype = jnp.bfloat16 if self.bf16 else jnp.float32
        masked_kspace = constrain_coil_axis(masked_kspace, self.coil_axis)
        sens_maps = SensitivityModel(
            self.sens_chans, self.sens_pools, packed=self.packed,
            dtype=dtype, coil_axis=self.coil_axis, name="sens_net"
        )(masked_kspace, mask)
        sens_maps = constrain_coil_axis(sens_maps, self.coil_axis)
        lam = self.param("lambda_reg", lambda_init, (self.num_cascades,))

        use_kernel = self.kernel_dc and is_line_mask(mask)
        if use_kernel:
            dc_kernel = masked_normal_kernel(mask)
            rss0 = coil_weight(sens_maps)  # hoisted out of the cascade scan
            x_ref = sens_reduce(masked_kspace, sens_maps)  # (b, t, 1, h, w)
            carry0, ref = x_ref, x_ref
        else:
            dc_kernel, rss0, carry0, ref = None, None, masked_kspace, masked_kspace

        from cinemri_tpu.models.remat import wrap_remat

        block = wrap_remat(
            VarNetCascade, self.remat, self.remat_policy, self.remat_prevent_cse
        )
        scan = nn.scan(
            block,
            variable_broadcast="params",  # regularizer U-Net shared (varnet.py:138-149)
            split_rngs={"params": False},
            in_axes=(0,) + (nn.broadcast,) * 5,
            length=self.num_cascades,
        )
        pred, _ = scan(
            chans=self.chans,
            pools=self.pools,
            dynamic_type=self.dynamic_type,
            weight_sharing=self.weight_sharing,
            plane_axis=self.plane_axis,
            coil_axis=self.coil_axis,
            packed=self.packed,
            dtype=dtype,
            name="cascades",
        )(carry0, lam, ref, mask, sens_maps, dc_kernel, rss0)

        if use_kernel:
            return pred[:, :, 0].abs()  # carry IS sens_reduce(k_pred)
        image = sens_reduce(pred, sens_maps, keepdims=False)  # (b, t, h, w)
        return image.abs()
