"""ESPIRiT coil-sensitivity calibration, JAX-native.

Replaces the reference's external BART C toolbox calls
(``bart.bart(2, 'ecalib -r 200', ...)`` at reconstruction/data/mri_data.py:294-298
for target synthesis, and ``'ecalib -r 15'`` at data/transforms.py:425-432 for
CineNet input maps). The reference shells out to native C inside every
``__getitem__`` — the dominant data-path cost (SURVEY §3.4). Here calibration
is a jitted XLA program, so maps can be computed on-accelerator and cached.

Algorithm (Uecker et al., "ESPIRiT — An Eigenvalue Approach to Autocalibrating
Parallel MRI", MRM 2014), with two structural choices that make it
static-shaped and TPU-friendly:

  1. **Gram trick.** Instead of the SVD of the tall block-Hankel calibration
     matrix A (``(positions) x (c*k*k)``), take ``eigh`` of the small Gram
     matrix AᴴA (``(c*k*k)²``). The signal subspace is selected by a 0/1
     weight per eigenvector (``σ > thresh·σ_max``) rather than by slicing a
     data-dependent number of columns — shapes stay static under jit.
  2. **Autocorrelation FFTs.** The pointwise operator
     ``G(x) = Σ_k V_k(x) V_k(x)ᴴ`` is not assembled from per-kernel image
     transforms (K·c full-size IFFTs and a (K,c,h,w) intermediate). With
     ``P = Σ_k w_k v_k v_kᴴ`` the projector onto the signal subspace,
     ``G_cc'(x)`` is the inverse DFT of the kernel autocorrelation
     ``Q_cc'(Δ) = Σ_δ P[(c,δ+Δ),(c',δ)]`` — support only ``(2k-1)²`` — so G
     costs c² small FFTs and one tiny matmul regardless of kernel count.

Per-pixel maps are the top eigenvector of G (batched ``eigh``), unit-norm,
phase-referenced to coil 0, hard-cropped where the top eigenvalue is below
``crop`` (BART ecalib's default crop behavior; defaults ``kernel_size=6``,
``thresh=0.001``, ``crop=0.8`` match BART's ``-k/-t/-c``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["espirit_maps", "calibration_matrix_gram"]


def _extract_calib(kspace: jnp.ndarray, calib_size: int) -> jnp.ndarray:
    """Center-crop the calibration region from (c, h, w) k-space."""
    c, h, w = kspace.shape
    ch = min(calib_size, h)
    cw = min(calib_size, w)
    h0 = (h - ch) // 2
    w0 = (w - cw) // 2
    return kspace[:, h0 : h0 + ch, w0 : w0 + cw]


def calibration_matrix_gram(calib: jnp.ndarray, k: int) -> jnp.ndarray:
    """Gram matrix AᴴA of the block-Hankel calibration matrix.

    ``calib``: (c, ch, cw); returns ``(c*k*k, c*k*k)`` Hermitian, with the
    patch axis ordered (coil, dy, dx) — row-major over kernel offsets.
    """
    c, ch, cw = calib.shape
    nh, nw = ch - k + 1, cw - k + 1
    cols = []
    for dy in range(k):
        for dx in range(k):
            cols.append(calib[:, dy : dy + nh, dx : dx + nw].reshape(c, nh * nw))
    # Aᵀ with row order (coil, dy, dx): (c, k*k, positions) -> (c*k*k, positions)
    at = jnp.stack(cols, axis=1).reshape(c * k * k, nh * nw)
    return at @ at.conj().T  # (ckk, ckk); MXU matmul


def _autocorrelation(p: jnp.ndarray, c: int, k: int) -> jnp.ndarray:
    """Q_cc'(Δ) = Σ_δ P[(c, δ+Δ), (c', δ)]; output (c, c, 2k-1, 2k-1)."""
    pr = p.reshape(c, k, k, c, k, k)
    out = []
    for dy in range(-k + 1, k):
        row = []
        ys = slice(max(0, dy), min(k, k + dy))  # valid δy + Δy range
        yd = slice(max(0, -dy), min(k, k - dy))
        for dx in range(-k + 1, k):
            xs = slice(max(0, dx), min(k, k + dx))
            xd = slice(max(0, -dx), min(k, k - dx))
            # sum over δ of P[(c, δ+Δ), (c', δ)] — paired (diagonal) offsets
            row.append(jnp.einsum("cyxdyx->cd", pr[:, ys, xs, :, yd, xd]))
        out.append(jnp.stack(row, axis=-1))
    return jnp.stack(out, axis=-2)  # (c, c, 2k-1, 2k-1)


@partial(jax.jit, static_argnames=("calib_size", "kernel_size"))
def _espirit_impl(
    kspace: jnp.ndarray,
    calib_size: int,
    kernel_size: int,
    thresh: float,
    crop: float,
):
    c, h, w = kspace.shape
    k = kernel_size

    calib = _extract_calib(kspace, calib_size)
    gram = calibration_matrix_gram(calib, k)

    evals, evecs = jnp.linalg.eigh(gram)  # ascending; evals = σ²
    sig = evals > (thresh ** 2) * evals[-1]
    weights = sig.astype(gram.dtype)
    # projector onto the signal subspace of the row space of A
    p = (evecs * weights[None, :]) @ evecs.conj().T  # (ckk, ckk)

    q = _autocorrelation(p, c, k)  # (c, c, 2k-1, 2k-1)

    # place Q(Δ) at frequency indices Δ mod N and inverse-DFT:
    # G_cc'(x) = (1/k²) Σ_Δ Q(Δ) e^{2πiΔ·x/N}
    grid = jnp.zeros((c, c, h, w), dtype=kspace.dtype)
    dy = (jnp.arange(-k + 1, k)) % h
    dx = (jnp.arange(-k + 1, k)) % w
    grid = grid.at[:, :, dy[:, None], dx[None, :]].set(q)
    g = jnp.fft.ifft2(grid, axes=(-2, -1)) * (h * w) / (k * k)
    # align with the centered-image convention of ifft2c (origin at center)
    g = jnp.fft.fftshift(g, axes=(-2, -1))
    g = jnp.moveaxis(g, (0, 1), (2, 3))  # (h, w, c, c)
    # enforce hermitian symmetry lost to fp rounding
    g = 0.5 * (g + jnp.conj(jnp.swapaxes(g, -1, -2)))

    evals_g, evecs_g = jnp.linalg.eigh(g)  # (h, w, c) asc / (h, w, c, c)
    top_val = evals_g[..., -1].real
    maps = evecs_g[..., -1]  # (h, w, c), unit norm

    # phase-reference to coil 0 (map magnitudes/targets are invariant)
    phase = jnp.exp(-1j * jnp.angle(maps[..., :1]))
    maps = maps * phase
    maps = maps * (top_val[..., None] >= crop)
    return jnp.moveaxis(maps, -1, 0).astype(jnp.complex64), top_val.astype(jnp.float32)


def espirit_maps(
    kspace: jnp.ndarray,
    calib_size: int = 24,
    kernel_size: int = 6,
    thresh: float = 0.001,
    crop: float = 0.8,
    return_eigenvalues: bool = False,
):
    """Estimate sensitivity maps from (time-averaged) multi-coil k-space.

    Args:
        kspace: ``(c, h, w)`` complex64, centered (DC at ``(h//2, w//2)``).
        calib_size: side of the square central calibration region (BART
            ``-r``; the reference uses 200 = full grid for targets, 15 for
            CineNet per-sample maps).
        kernel_size / thresh / crop: BART ``-k`` / ``-t`` / ``-c`` analogues.

    Returns:
        ``(c, h, w)`` complex64 maps (unit-norm per pixel inside the crop
        mask, zero outside); optionally also the ``(h, w)`` top eigenvalue.
    """
    kspace = jnp.asarray(kspace, dtype=jnp.complex64)
    if kspace.ndim != 3:
        raise ValueError(f"expected (c, h, w) k-space, got {kspace.shape}")
    maps, ev = _espirit_impl(
        kspace, int(calib_size), int(kernel_size), float(thresh), float(crop)
    )
    if return_eigenvalues:
        return maps, ev
    return maps
