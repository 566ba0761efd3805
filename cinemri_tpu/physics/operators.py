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
    "is_line_mask",
    "masked_normal_kernel",
    "normal_plus_lambda_kernel",
    "coil_weight",
    "soft_dc_image_kernel",
    "set_normal_backend",
    "get_normal_backend",
    "constrain_coil_axis",
]

COIL_AXIS = 2

# Backend for the kernelized normal-operator apply: "xla" (einsum chain,
# coil-expanded intermediates in HBM), "pallas" (fused VMEM-resident
# kernel, ops/kernels/normal_pallas.py — one HBM round trip per apply),
# or "auto". The round-3 chip A/B measured the two backends identical to
# within 0.3% wall-clock on every CineNet variant at the protocol shape
# (XLA's fusion pipeline already streams the coil chain at HBM
# speed-of-light; BASELINE.md), so "auto" resolves to the semantically
# wider XLA path everywhere and pallas stays an explicit opt-in.
_NORMAL_BACKEND = "xla"


def set_normal_backend(backend: str) -> None:
    """Select the normal-operator apply backend ('xla', 'pallas', 'auto').

    Callers must re-jit (new trace) for the change to take effect. Also
    settable via the ``CINEMRI_NORMAL_BACKEND`` environment variable (read
    at import). The pallas backend declares the kernel matrix (== the
    undersampling mask) non-differentiable — identical semantics for every
    model path, since masks are data, never learned.
    """
    global _NORMAL_BACKEND
    if backend not in ("xla", "pallas", "auto"):
        raise ValueError(f"unknown normal backend {backend!r}")
    _NORMAL_BACKEND = backend


def get_normal_backend() -> str:
    """The raw backend setting ('xla' | 'pallas' | 'auto'), unresolved."""
    return _NORMAL_BACKEND


def _resolve_normal_backend() -> str:
    """'auto' -> 'xla' (measured equal to pallas on-chip; see header)."""
    if _NORMAL_BACKEND != "auto":
        return _NORMAL_BACKEND
    return "xla"


import os as _os  # noqa: E402

if _os.environ.get("CINEMRI_NORMAL_BACKEND"):
    set_normal_backend(_os.environ["CINEMRI_NORMAL_BACKEND"])


def _pallas_normal_eligible(x: Complex, kernel: Complex, sens: Complex) -> bool:
    """Static gate for the fused pallas apply (shapes/dtype/VMEM/backend)."""
    from cinemri_tpu.ops.kernels import normal_pallas as NP
    from cinemri_tpu.ops.kernels.dft_pallas import pallas_available

    if not (
        x.ndim == 5
        and x.shape[2] == 1
        and sens.ndim == 5
        and sens.shape[1] == 1
        and kernel.ndim == 4
        and kernel.shape[0] == x.shape[0]
        and kernel.shape[1] in (1, x.shape[1])
        and kernel.shape[2] == kernel.shape[3] == x.shape[3]
        and x.dtype == jnp.float32
        and sens.dtype == jnp.float32
    ):
        return False
    b, t = x.shape[:2]
    c, h, w = sens.shape[2], x.shape[3], x.shape[4]
    if NP.vmem_estimate(b, t, c, h, w) > NP.NORMAL_VMEM_GUARD_BYTES:
        return False
    return NP._INTERPRET or pallas_available()


def _c(x) -> Complex:
    return x if isinstance(x, Complex) else from_complex(x)


def constrain_coil_axis(x, axis_name: str, dim: int = COIL_AXIS):
    """Shard-constrain the coil dimension over a mesh axis (tensor parallel).

    The coil dimension of ``(b, t, c, h, w)`` k-space / ``(b, 1, c, h, w)``
    sensitivity maps is embarrassingly parallel everywhere except the
    coil-combine reductions (:func:`sens_reduce`'s ``csum``,
    :func:`coil_weight`, RSS normalization). Anchoring it to a mesh axis
    with this constraint makes XLA's SPMD partitioner compute every
    coil-carrying tensor shard-locally — the per-coil IFFTs, the normal
    operator's three Gauss matmuls, the sensitivity U-Net's coil-folded
    batch — and lower each reduction to one ``all-reduce`` over ICI. This
    is the tensor-parallel layout for high-coil-count arrays (clinical cine
    uses 15-30 receive channels; the reference, which loads all coils onto
    one GPU, has no analogue — mri_data.py:279-283 fixes c at file level).

    No-op when ``axis_name`` is empty. Requires an ambient mesh
    (``jax.set_mesh``) carrying the axis, like the models' ``plane_axis``,
    and a coil count divisible by the mesh axis size. Coil-sharded runs
    must use the ``xla`` normal backend: Pallas kernels are opaque to the
    SPMD partitioner (:func:`set_normal_backend`).
    """
    if not axis_name:
        return x
    import jax
    from jax.sharding import PartitionSpec

    shape = (x.re if isinstance(x, Complex) else x).shape
    ambient = getattr(jax.sharding.get_abstract_mesh(), "shape", {})
    n = ambient.get(axis_name)
    if n and shape[dim] % n:
        raise ValueError(
            f"coil dimension of size {shape[dim]} (shape {tuple(shape)}, "
            f"dim {dim}) does not divide over the {n}-device "
            f"{axis_name!r} mesh axis — pick a coil-axis size that divides "
            "the (possibly --compress_coils-reduced) coil count"
        )

    def one(a):
        spec = [None] * a.ndim
        spec[dim] = axis_name
        return jax.lax.with_sharding_constraint(a, PartitionSpec(*spec))

    if isinstance(x, Complex):
        return Complex(one(x.re), one(x.im))
    return one(x)


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


def is_line_mask(mask: jnp.ndarray) -> bool:
    """True for Cartesian phase-encode line masks ``(b, t|1, 1, h, 1)`` —
    the shape :func:`masked_normal_kernel` can collapse into an h-axis
    matrix. Both reference mask generators emit this shape
    (subsample.py:146-151, 210-214).

    Shape check only: the kernelized DC paths gated on this predicate
    (:func:`soft_dc_image_kernel`, the XPDNet measurements-residual
    collapse) additionally require the mask values to be **binary 0/1**
    (they use ``m*m = m`` and ``m*k_ref = k_ref`` for pre-masked reference
    k-space). Both reference generators emit 0/1 masks; a density-weighted
    mask would silently change semantics between ``kernel_dc=1`` and
    ``kernel_dc=0`` — pass ``kernel_dc=0`` for non-binary masks.
    """
    return mask.ndim == 5 and mask.shape[2] == 1 and mask.shape[-1] == 1


def masked_normal_kernel(mask: jnp.ndarray, norm: str = "ortho") -> Complex:
    """Precompute ``T = F_hᴴ · diag(m) · F_h`` for the CG normal operator.

    Cartesian line masks vary only along the phase-encode axis ``h``
    (shape ``(b, t|1, 1, h, 1)``), so in ``Aᴴ M A = Σ_c S̄_c F⁻¹ M F S_c``
    the w-axis transform commutes with ``M`` and cancels, and the remaining
    1-D sandwich collapses into one precomputed ``h x h`` complex matrix per
    (batch, frame). Each CG iteration then costs ONE batched MXU matmul
    along ``h`` instead of the four DFT passes of
    ``fft2c -> mask -> ifft2c`` — the reference pays the full 2-D pair per
    iteration (cinenet.py:121-133).

    Returns a :class:`Complex` of shape ``(b, t|1, h, h)``; build it once
    per forward (outside the cascade scan) and feed
    :func:`normal_plus_lambda_kernel`.
    """
    from cinemri_tpu.ops import fft as F

    if mask.ndim != 5 or mask.shape[2] != 1 or mask.shape[-1] != 1:
        raise ValueError(
            f"expected a line mask (b, t|1, 1, h, 1), got {mask.shape}"
        )
    h = mask.shape[3]
    wfr, wfi = F._dft_matrix(h, inverse=False, alt=False, norm=norm)
    wir, wii = F._dft_matrix(h, inverse=True, alt=False, norm=norm)
    wfr, wfi, wir, wii = map(jnp.asarray, (wfr, wfi, wir, wii))
    m = mask[:, :, 0, :, 0]  # (b, t|1, h)
    prec = F._DFT_PRECISION
    # A = diag(m) @ W_f (row scaling), then T = W_i @ A (Gauss 3-mul)
    ar = m[..., :, None] * wfr
    ai = m[..., :, None] * wfi

    def mm(w, v):
        return jnp.einsum("ik,btkj->btij", w, v, precision=prec)

    t1 = mm(wir, ar)
    t2 = mm(wii, ai)
    t3 = mm(wir + wii, ar + ai)
    return Complex(t1 - t2, t3 - t1 - t2)


def coil_weight(sens_maps) -> jnp.ndarray:
    """``R0 = Σ_c |S_c|²`` — real array (b, 1, 1, h, w).

    Exactly 1 when the maps are RSS-normalized (as both sensitivity models
    and ESPIRiT maps are), but kept explicit so
    :func:`soft_dc_image_kernel` is exact for arbitrary maps.
    """
    s = _c(sens_maps)
    return (s.re * s.re + s.im * s.im).sum(axis=COIL_AXIS, keepdims=True)


def soft_dc_image_kernel(
    model_out, x_ref, kernel: Complex, sens_maps, v, rss_sq: jnp.ndarray | None = None
) -> Complex:
    """The VarNet cascade's k-space round trip collapsed into image space.

    The reference block (varnet.py:244-282) computes
    ``sens_reduce(soft_dc(sens_expand(z), k_ref, m, v))`` — a full 2-D FFT
    pair over every coil per cascade. Because ``k_pred`` enters the next
    cascade ONLY through ``sens_reduce``, and soft DC is affine in
    ``F·S·z``, the whole leg is algebraically

        ``R0 ⊙ z − α·N(z) + α·x_ref``,   α = v/(1+v),

    where ``N`` is the masked normal operator (one h-axis MXU matmul via
    :func:`masked_normal_kernel` for Cartesian line masks), ``R0 = Σ|S_c|²``
    and ``x_ref = sens_reduce(masked_kspace)`` — using ``m ⊙ k_ref = k_ref``
    (the reference k-space is already masked) and ``FᴴF = Id``. Exact to
    f32 rounding (tested against the direct path); no per-cascade DFTs.

    Precondition: the mask is **binary 0/1** and ``x_ref`` comes from
    k-space already multiplied by that mask — the derivation uses
    ``m*m = m`` and ``m ⊙ k_ref = k_ref``. Non-binary (e.g.
    density-compensated) masks must use the direct path
    (see :func:`is_line_mask`).

    Args:
        model_out: regularizer output, Complex (b, t, 1, h, w).
        x_ref: zero-filled reference image, Complex (b, t, 1, h, w).
        kernel: from :func:`masked_normal_kernel`.
        v: softplus(λ) data-consistency weight (scalar).
        rss_sq: optional precomputed :func:`coil_weight`.
    """
    z = _c(model_out)
    if rss_sq is None:
        rss_sq = coil_weight(sens_maps)
    alpha = v / (1 + v)
    n = normal_plus_lambda_kernel(z, kernel, sens_maps, 0.0)
    return z * rss_sq - alpha * n + alpha * _c(x_ref)


def normal_plus_lambda_kernel(x, kernel: Complex, sens_maps, lam) -> Complex:
    """``H(x) = Aᴴ M A x + λ x`` using a precomputed h-axis kernel.

    Mathematically identical to :func:`normal_plus_lambda` (to matmul
    rounding) at a quarter of its DFT cost — see
    :func:`masked_normal_kernel`.
    """
    from cinemri_tpu.ops import fft as F

    x = _c(x)
    sens = _c(sens_maps)

    if _resolve_normal_backend() == "pallas" and _pallas_normal_eligible(x, kernel, sens):
        from jax import lax as _lax

        from cinemri_tpu.ops.kernels.normal_pallas import normal_apply_pallas

        outr, outi = normal_apply_pallas(
            x.re[:, :, 0],
            x.im[:, :, 0],
            _lax.stop_gradient(kernel.re),
            _lax.stop_gradient(kernel.im),
            sens.re[:, 0],
            sens.im[:, 0],
            jnp.asarray(lam, jnp.float32),
        )
        return Complex(outr[:, :, None], outi[:, :, None])

    y = x * sens  # (b, t, c, h, w)
    b, t = y.shape[:2]
    h = y.shape[3]
    prec = F._DFT_PRECISION

    kr = jnp.broadcast_to(kernel.re, (b, t, h, h))
    ki = jnp.broadcast_to(kernel.im, (b, t, h, h))

    def mm(w, v):
        return jnp.einsum("btik,btckw->btciw", w, v, precision=prec)

    t1 = mm(kr, y.re)
    t2 = mm(ki, y.im)
    t3 = mm(kr + ki, y.re + y.im)
    z = Complex(t1 - t2, t3 - t1 - t2)
    return csum(z * sens.conj(), axis=COIL_AXIS, keepdims=True) + lam * x


def soft_sense_expand(components, sens_maps_multi) -> Complex:
    """Soft-SENSE forward: component images -> multi-coil k-space.

    ``components``: (b, t, m, h, w) Complex — one image per ESPIRiT
    eigenvector set (data/espirit.py::espirit_maps_multi); 
    ``sens_maps_multi``: (b, m, c, h, w). Returns ``F Σ_m S_m ⊙ x_m``
    of shape (b, t, c, h, w). With m=1 this is exactly :func:`sens_expand`.
    Soft-SENSE (Uecker et al. 2014) models aliased-FOV acquisitions the
    reference's hard single-map model cannot represent; out of reference
    scope, adjoint-tested against :func:`soft_sense_reduce`.
    """
    x = _c(components)
    s = _c(sens_maps_multi)
    coil = csum(x[:, :, :, None] * s[:, None], axis=2)  # (b, t, c, h, w)
    return fft2c(coil)


def soft_sense_reduce(kspace, sens_maps_multi) -> Complex:
    """Soft-SENSE adjoint: multi-coil k-space -> per-set component images.

    ``kspace``: (b, t, c, h, w); ``sens_maps_multi``: (b, m, c, h, w).
    Returns (b, t, m, h, w): ``x_m = Σ_c conj(S_m) ⊙ F⁻¹ k``. With m=1
    this is exactly :func:`sens_reduce`.
    """
    img = ifft2c(_c(kspace))  # (b, t, c, h, w)
    s = _c(sens_maps_multi)
    return csum(img[:, :, None] * s[:, None].conj(), axis=3)


def soft_sense_rss(components) -> jnp.ndarray:
    """Magnitude recon from soft-SENSE components: sqrt(Σ_m |x_m|²)."""
    x = _c(components)
    return jnp.sqrt((x.abs() ** 2).sum(axis=2))


def soft_sense_recon(
    masked_kspace, mask: jnp.ndarray, sens_maps_multi, lam: float = 1e-2,
    iters: int = 10, return_components: bool = False,
):
    """CG-SENSE reconstruction over multiple ESPIRiT map sets.

    Solves ``(Aᴴ M A + λ) x = Aᴴ y`` for the component images
    ``x: (b, t, m, h, w)`` with ``A = soft_sense_expand`` and returns the
    RSS-combined magnitude (b, t, h, w). With aliased-FOV acquisitions the
    m ≥ 2 sets let the model represent the folded signal the reference's
    single-map pipeline cannot (Uecker et al. 2014, soft-SENSE); with m=1
    this is plain CG-SENSE. Beyond reference scope; exercised end-to-end by
    tests/test_espirit.py::TestSoftSenseOps::test_recon_dealiases.
    """
    from cinemri_tpu.physics.cg import conj_grad

    y = apply_mask(masked_kspace, mask)
    rhs = soft_sense_reduce(y, sens_maps_multi)

    def normal(x):
        k = apply_mask(soft_sense_expand(x, sens_maps_multi), mask)
        return soft_sense_reduce(k, sens_maps_multi) + lam * _c(x)

    x = conj_grad(normal, rhs, rhs, iters=iters)
    if return_components:
        return x
    return soft_sense_rss(x)
