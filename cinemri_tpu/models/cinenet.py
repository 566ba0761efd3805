"""CineNet: alternating U-Net denoising and conjugate-gradient data
consistency in image space.

Parity target: reference reconstruction/models/cinenet.py:14-257. Unlike
VarNet, CineNet takes *precomputed* sensitivity maps as input (the
reference's data transform runs a second BART ``ecalib -r 15`` per sample,
transforms.py:425-432; here maps come from the JAX ESPIRiT in
:class:`~cinemri_tpu.data.transforms.CineNetDataTransform`), its denoisers
operate on raw real/imag channels (plain U-Nets, no normalization wrapper),
and each cascade ends with a CG solve of ``(AᴴA + v·I) x = x_ref + v·x_den``
— run fully on device (:mod:`cinemri_tpu.physics.cg`), not with the
reference's per-iteration ``.item()`` host syncs (cinenet.py:159-169).

Cascade structure mirrors VarNet's scan: one shared denoiser U-Net
(cinenet.py:46-57 builds a single model reused by every block) with a
per-cascade learned λ scanned as loop input.

I/O: ``masked_kspace (b, t, c, h, w)``, ``mask (b, t|1, 1, h, 1)``,
``sens_maps (b, 1, c, h, w)`` -> ``(b, t, h, w) float32``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from cinemri_tpu.models.denoisers.unet import Unet
from cinemri_tpu.models.varnet import lambda_init
from cinemri_tpu.ops.cplx import cmean, from_channels, to_channels
from cinemri_tpu.ops.fft import fft1c, ifft1c
from cinemri_tpu.physics.cg import conj_grad
from cinemri_tpu.physics.operators import (
    constrain_coil_axis,
    is_line_mask,
    masked_normal_kernel,
    normal_plus_lambda,
    normal_plus_lambda_kernel,
    sens_reduce,
)

__all__ = ["CineNet", "CineNetCascade"]


_to_real_ch = to_channels
_to_complex = from_channels


class CineNetCascade(nn.Module):
    """Denoise -> CG block (cinenet.py:77-257)."""

    chans: int
    pools: int
    cg_iters: int = 4
    dynamic_type: str = "XF"
    weight_sharing: bool = False
    plane_axis: str = ""  # sequence-parallel mesh axis (see VarNetCascade)
    coil_axis: str = ""  # tensor-parallel mesh axis for the coil dim
    packed: bool = False  # space-to-depth denoisers (unet.Unet.packed)
    dtype: jnp.dtype = jnp.float32  # denoiser activation dtype

    def _unet(self, name: str) -> Unet:
        dims = 3 if self.dynamic_type == "3D" else 2
        return Unet(
            chans=self.chans, num_pool_layers=self.pools, dims=dims,
            packed=self.packed, dtype=self.dtype, name=name,
        )

    def _xfyf(self, x: jnp.ndarray) -> jnp.ndarray:
        """cinenet.py:176-220 — same rotation as VarNet but the plane nets
        see raw [re, im] channels instead of a normalized wrapper."""
        b, t, h, w = x.shape
        mean = cmean(x, axis=1, keepdims=True)
        x = x - mean
        if self.dynamic_type == "XF":
            x = fft1c(x, axis=1)

        xf = _to_real_ch(x.transpose(0, 2, 3, 1)).reshape(b * h, w, t, 2)
        yf = _to_real_ch(x.transpose(0, 3, 2, 1)).reshape(b * w, h, t, 2)
        if self.plane_axis:
            from jax.sharding import PartitionSpec

            spec = PartitionSpec(self.plane_axis)
            xf = jax.lax.with_sharding_constraint(xf, spec)
            yf = jax.lax.with_sharding_constraint(yf, spec)
        if self.weight_sharing:
            net = self._unet("plane_net")
            xf, yf = net(xf), net(yf)
        else:
            xf = self._unet("net_xf")(xf)
            yf = self._unet("net_yf")(yf)
        xf = _to_complex(xf.reshape(b, h, w, t, 2)).transpose(0, 3, 1, 2)
        yf = _to_complex(yf.reshape(b, w, h, t, 2)).transpose(0, 3, 2, 1)
        out = 0.5 * (xf + yf)

        if self.dynamic_type == "XF":
            out = ifft1c(out, axis=1)
        return out + mean

    @nn.compact
    def __call__(self, image_pred, lam, image_ref, mask, sens_maps, dc_kernel):
        x = image_pred[:, :, 0]  # (b, t, h, w) complex
        b, t, h, w = x.shape

        if self.dynamic_type in ("XF", "XT"):
            model_out = self._xfyf(x)
        elif self.dynamic_type == "2D":
            out = self._unet("net")(_to_real_ch(x).reshape(b * t, h, w, 2))
            model_out = _to_complex(out.reshape(b, t, h, w, 2))
        elif self.dynamic_type == "3D":
            model_out = _to_complex(self._unet("net")(_to_real_ch(x)))
        else:
            raise ValueError(f"unknown dynamic_type {self.dynamic_type}")

        model_out = model_out[:, :, None]  # (b, t, 1, h, w)
        v = jax.nn.softplus(lam)
        # re-anchor the coil layout inside the scan body (see VarNetCascade)
        sens_maps = constrain_coil_axis(sens_maps, self.coil_axis)
        rhs = image_ref + v * model_out  # cinenet.py:255-257
        if dc_kernel is None:
            op = lambda z: normal_plus_lambda(z, mask, sens_maps, v)
        else:
            op = lambda z: normal_plus_lambda_kernel(z, dc_kernel, sens_maps, v)
        x_new = conj_grad(op, rhs, model_out, iters=self.cg_iters)
        return x_new, None


class CineNet(nn.Module):
    """Full dynamic CineNet (cinenet.py:14-73)."""

    num_cascades: int = 12
    cg_iters: int = 4
    chans: int = 18
    pools: int = 4
    dynamic_type: str = "XF"
    weight_sharing: bool = False
    remat: bool = True
    plane_axis: str = ""  # sequence-parallel mesh axis for XT/XF planes
    # tensor-parallel mesh axis for the coil dimension (see VarNet.coil_axis)
    coil_axis: str = ""
    # space-to-depth lane packing of the denoiser conv stacks — exact,
    # same params (denoisers/packed_unet.py)
    packed: bool = False
    # bfloat16 denoiser activations (see VarNet.bf16); CG/DC stay f32
    bf16: bool = False
    # Run the CG normal operator through the precomputed h-axis kernel
    # (physics.operators.masked_normal_kernel): one MXU matmul per CG apply
    # instead of the reference's full 2-D FFT pair per iteration
    # (cinenet.py:121-133). Numerically identical to matmul rounding;
    # auto-falls back to the direct operator for non-line masks.
    kernel_dc: bool = True
    # cascade-remat checkpoint policy (models.remat.REMAT_POLICIES); exact
    remat_policy: str = ""
    remat_prevent_cse: bool = True

    @nn.compact
    def __call__(
        self, masked_kspace: jnp.ndarray, mask: jnp.ndarray, sens_maps: jnp.ndarray
    ) -> jnp.ndarray:
        if self.dynamic_type not in ("2D", "3D", "XT", "XF"):
            raise ValueError(
                "dynamic_type must be 2D/3D/XT/XF (CRNN is models.recurrent.CineNetRNN)"
            )
        masked_kspace = constrain_coil_axis(masked_kspace, self.coil_axis)
        sens_maps = constrain_coil_axis(sens_maps, self.coil_axis)
        image_ref = sens_reduce(masked_kspace, sens_maps)  # (b, t, 1, h, w)
        lam = self.param("lambda_reg", lambda_init, (self.num_cascades,))
        dc_kernel = (
            masked_normal_kernel(mask)
            if self.kernel_dc and is_line_mask(mask)
            else None
        )

        from cinemri_tpu.models.remat import wrap_remat

        block = wrap_remat(
            CineNetCascade, self.remat, self.remat_policy, self.remat_prevent_cse
        )
        scan = nn.scan(
            block,
            variable_broadcast="params",  # shared denoiser (cinenet.py:46-57)
            split_rngs={"params": False},
            in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
            length=self.num_cascades,
        )
        image_pred, _ = scan(
            chans=self.chans,
            pools=self.pools,
            cg_iters=self.cg_iters,
            dynamic_type=self.dynamic_type,
            weight_sharing=self.weight_sharing,
            plane_axis=self.plane_axis,
            coil_axis=self.coil_axis,
            packed=self.packed,
            dtype=jnp.bfloat16 if self.bf16 else jnp.float32,
            name="cascades",
        )(image_ref, lam, image_ref, mask, sens_maps, dc_kernel)

        return image_pred[:, :, 0].abs()
