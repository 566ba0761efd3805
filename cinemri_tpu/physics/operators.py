"""MRI encoding-operator algebra on Complex (re, im) pairs.

Parity targets (reference file:line):
  * ``sens_expand`` / ``sens_reduce`` — reconstruction/models/varnet.py:181-194
    (same math repeated in cinenet.py:108-121 and xpdnet.py:104-167).
  * ``apply_mask`` — reconstruction/data/transforms.py:66-92.
  * ``soft_dc`` — varnet.py:280-282: the learned-λ soft data-consistency
    ``(1-m)·Tx + m·(Tx + v·k_ref)/(1+v)``.
  * ``normal_plus_lambda`` — the CG system operator
    ``H = AᴴA + λ·Id`` (cinenet.py:121-133).

Shapes: k-space ``(b, t, c, h, w)`` Complex; sensitivity maps
``(b, 1, c, h, w)`` Complex; coil-combined images ``(b, t, 1, h, w)``
Complex; masks broadcastable real float arrays, canonically
``(b, t, 1, h, 1)``.
"""

from __future__ import annotations

import jax.numpy as jnp

from cinemri_tpu.ops.cplx import Complex, csum, from_complex
from cinemri_tpu.ops.fft import fft2c, ifft2c

__all__ = [
    "sens_expand",
    "sens_reduce",
    "apply_mask",
    "soft_dc",
    "normal_plus_lambda",
]

COIL_AXIS = 2


def _c(x) -> Complex:
    return x if isinstance(x, Complex) else from_complex(x)


def sens_expand(image, sens_maps) -> Complex:
    """Coil-combined image -> multi-coil k-space: ``F (S ⊙ x)``."""
    return fft2c(_c(image) * _c(sens_maps))


def sens_reduce(kspace, sens_maps, keepdims: bool = True) -> Complex:
    """Multi-coil k-space -> coil-combined image: ``Σ_c conj(S) ⊙ F⁻¹ k``."""
    image = ifft2c(_c(kspace))
    return csum(image * _c(sens_maps).conj(), axis=COIL_AXIS, keepdims=keepdims)


def apply_mask(kspace, mask: jnp.ndarray) -> Complex:
    """Subsample k-space by elementwise mask multiplication."""
    return _c(kspace) * mask


def soft_dc(model_term, ref_kspace, mask: jnp.ndarray, v) -> Complex:
    """Soft data consistency with learned regularization weight ``v``.

    ``v = softplus(λ)`` with λ initialized to log(e−1) so v starts at 1
    (varnet.py:176-179).
    """
    model_term = _c(model_term)
    return (1 - mask) * model_term + mask * (
        (model_term + v * _c(ref_kspace)) / (1 + v)
    )


def normal_plus_lambda(x, mask: jnp.ndarray, sens_maps, lam) -> Complex:
    """``H(x) = Aᴴ M A x + λ x`` — the CG system operator (cinenet.py:121-133)."""
    x = _c(x)
    k = sens_expand(x, sens_maps)
    k = apply_mask(k, mask)
    return sens_reduce(k, sens_maps, keepdims=True) + lam * x
