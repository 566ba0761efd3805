"""MRI encoding-operator algebra on native complex arrays.

Parity targets (reference file:line):
  * ``sens_expand`` / ``sens_reduce`` — reconstruction/models/varnet.py:181-194
    (same math repeated in cinenet.py:108-121 and xpdnet.py:104-167).
  * ``apply_mask`` — reconstruction/data/transforms.py:66-92.
  * ``soft_dc`` — varnet.py:280-282: the learned-λ soft data-consistency
    ``(1-m)·Tx + m·(Tx + v·k_ref)/(1+v)``.
  * ``normal_plus_lambda`` — the CG system operator
    ``H = AᴴA + λ·Id`` (cinenet.py:121-133).

Shapes: k-space ``(b, t, c, h, w)`` complex64; sensitivity maps
``(b, 1, c, h, w)``; coil-combined images ``(b, t, 1, h, w)`` (the singleton
axis keeps image/k-space ranks aligned so the same mask broadcast works in
both domains); masks broadcastable to k-space, canonically ``(b, t, 1, h, 1)``.
"""

from __future__ import annotations

import jax.numpy as jnp

from cinemri_tpu.ops.fft import fft2c, ifft2c

__all__ = [
    "sens_expand",
    "sens_reduce",
    "apply_mask",
    "soft_dc",
    "normal_plus_lambda",
]

COIL_AXIS = 2


def sens_expand(image: jnp.ndarray, sens_maps: jnp.ndarray) -> jnp.ndarray:
    """Coil-combined image -> multi-coil k-space: ``F (S ⊙ x)``."""
    return fft2c(image * sens_maps)


def sens_reduce(
    kspace: jnp.ndarray, sens_maps: jnp.ndarray, keepdims: bool = True
) -> jnp.ndarray:
    """Multi-coil k-space -> coil-combined image: ``Σ_c conj(S) ⊙ F⁻¹ k``."""
    image = ifft2c(kspace)
    return jnp.sum(image * jnp.conj(sens_maps), axis=COIL_AXIS, keepdims=keepdims)


def apply_mask(kspace: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Subsample k-space by elementwise mask multiplication."""
    return kspace * mask


def soft_dc(
    model_term: jnp.ndarray,
    ref_kspace: jnp.ndarray,
    mask: jnp.ndarray,
    v: jnp.ndarray,
) -> jnp.ndarray:
    """Soft data consistency with learned regularization weight ``v``.

    ``v = softplus(λ)`` with λ initialized to log(e−1) so v starts at 1
    (varnet.py:176-179).
    """
    return (1 - mask) * model_term + mask * (model_term + v * ref_kspace) / (1 + v)


def normal_plus_lambda(
    x: jnp.ndarray,
    mask: jnp.ndarray,
    sens_maps: jnp.ndarray,
    lam: jnp.ndarray,
) -> jnp.ndarray:
    """``H(x) = Aᴴ M A x + λ x`` — the CG system operator (cinenet.py:121-133)."""
    k = sens_expand(x, sens_maps)
    k = apply_mask(k, mask)
    return sens_reduce(k, sens_maps, keepdims=True) + lam * x
