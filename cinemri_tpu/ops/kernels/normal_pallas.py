"""Fused masked-normal-operator apply as a Pallas TPU kernel.

Computes ``out = Σ_c conj(S_c) ⊙ (K ∘_h (S_c ⊙ x)) + λ·x`` — the kernelized
CG/DC normal operator (physics.operators.normal_plus_lambda_kernel) — in one
kernel, with the coil-expanded intermediates living only in VMEM.

Why. The XLA path materializes ``y = S ⊙ x`` (b,t,c,h,w), three Gauss matmul
products of the same size, and the coil reduction — several hundred MB of
HBM round trips per apply at the protocol shape (15,10,200,200). CineNet
runs 60+ such applies per forward (6 CG iterations x 10 cascades), VarNet /
XPDNet one per cascade. This kernel streams only x, K, S and the output
(~30 MB per apply): per (batch, frame) grid step it keeps the full coil
stack resident in VMEM and loops the per-coil expand -> h-axis matmul ->
conj-reduce chain on-chip.

Gradients: a custom VJP backed by a second fused kernel. The apply is
complex-linear in ``x`` with a Hermitian operator, so the x-cotangent is the
same apply with ``K^H``; the sens-maps cotangent (needed by VarNet/XPDNet,
whose maps are learned) is ``conj(g)⊙z_c + (K^H(S_c⊙g))⊙conj(x)``, derived
by the product rule and verified against autodiff of the XLA path
(tests/test_kernels.py::TestNormalApplyKernel). The kernel matrix ``K``
derives from the (never-learned) undersampling mask, so its cotangent is
declared zero and the call site stop-gradients it.

Layout notes (pallas_guide.md): blocks are full (h, w) planes — at the
protocol size (200x200 f32) a program's working set is ~8 MB of VMEM; the
sens stack has a grid-constant index map over frames so Mosaic fetches it
once per batch row. The h-contraction matmuls run on the MXU at the same
``Precision`` the XLA DFT path uses (ops.fft._DFT_PRECISION, read at trace
time — re-jit to change, like set_dft_precision).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["normal_apply_pallas", "NORMAL_VMEM_GUARD_BYTES", "fwd_pallas_call"]

# Per-program VMEM working-set guard: x/out/K blocks (+double buffering),
# the grid-constant coil stack, and the per-coil temporaries. Programs whose
# estimate exceeds this fall back to the XLA path at the operators.py gate.
NORMAL_VMEM_GUARD_BYTES = 13 * 1024 * 1024

# Tests flip this to run the kernels under the Pallas interpreter on CPU.
_INTERPRET = False


def _precision():
    from cinemri_tpu.ops import fft as F

    return F._DFT_PRECISION


def _lane_pad(n: int, lanes: int = 128) -> int:
    return -(-n // lanes) * lanes


def vmem_estimate(b: int, t: int, c: int, h: int, w: int) -> int:
    """Rough per-program VMEM bytes for the forward kernel (f32)."""
    hp, wp = _lane_pad(h, 8), _lane_pad(w)
    plane = hp * wp * 4
    kmat = hp * _lane_pad(h) * 4
    # x + out (double-buffered) + K (double-buffered) + coil stack + temps
    return 2 * plane * 2 * 2 + 2 * kmat * 2 + 2 * c * plane + 8 * plane


def _fwd_kernel(c: int, xr_ref, xi_ref, kr_ref, ki_ref, sr_ref, si_ref,
                lam_ref, or_ref, oi_ref):
    prec = _precision()
    f32 = jnp.float32
    xr = xr_ref[0, 0]
    xi = xi_ref[0, 0]
    kr = kr_ref[0, 0]
    ki = ki_ref[0, 0]
    ks = kr + ki
    accr = jnp.zeros(xr.shape, f32)
    acci = jnp.zeros(xr.shape, f32)
    for ci in range(c):  # static coil count -> unrolled, static slices
        sr = sr_ref[0, ci]
        si = si_ref[0, ci]
        yr = sr * xr - si * xi
        yi = sr * xi + si * xr
        # z = K y via Gauss's 3-multiplication identity on the MXU
        t1 = jnp.dot(kr, yr, precision=prec, preferred_element_type=f32)
        t2 = jnp.dot(ki, yi, precision=prec, preferred_element_type=f32)
        t3 = jnp.dot(ks, yr + yi, precision=prec, preferred_element_type=f32)
        zr = t1 - t2
        zi = t3 - t1 - t2
        accr = accr + (sr * zr + si * zi)
        acci = acci + (sr * zi - si * zr)
    lam = lam_ref[0, 0]
    or_ref[0, 0] = accr + lam * xr
    oi_ref[0, 0] = acci + lam * xi


def _bwd_kernel(c: int, xr_ref, xi_ref, gr_ref, gi_ref, kr_ref, ki_ref,
                sr_ref, si_ref, lam_ref,
                xbr_ref, xbi_ref, sbr_ref, sbi_ref, lb_ref):
    prec = _precision()
    f32 = jnp.float32
    import jax.experimental.pallas as pl

    xr = xr_ref[0, 0]
    xi = xi_ref[0, 0]
    gr = gr_ref[0, 0]
    gi = gi_ref[0, 0]
    kr = kr_ref[0, 0]
    ki = ki_ref[0, 0]
    ks = kr + ki
    kd = kr - ki

    # The sens cotangent accumulates across frames into a grid-constant
    # output block: zero it on the first frame of each batch row.
    @pl.when(pl.program_id(1) == 0)
    def _():
        sbr_ref[0] = jnp.zeros(sbr_ref.shape[1:], f32)
        sbi_ref[0] = jnp.zeros(sbi_ref.shape[1:], f32)

    def dot0(a, b):
        # contract over the FIRST axis of a: (i,k),(i,w)->(k,w) == aᵀ b
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=prec, preferred_element_type=f32,
        )

    xbr = jnp.zeros(xr.shape, f32)
    xbi = jnp.zeros(xr.shape, f32)
    for ci in range(c):
        sr = sr_ref[0, ci]
        si = si_ref[0, ci]
        # v = S_c ⊙ g ; ȳ = K^H v  (K^H = conj(K)ᵀ -> Gauss on transposed dots)
        vr = sr * gr - si * gi
        vi = sr * gi + si * gr
        t1 = dot0(kr, vr)
        t2 = dot0(ki, vi)
        t3 = dot0(kd, vr + vi)
        ybr = t1 + t2
        ybi = t3 - t1 + t2
        # z = K (S_c ⊙ x)  (recomputed; saving it would be 100 MB/apply)
        yr = sr * xr - si * xi
        yi = sr * xi + si * xr
        u1 = jnp.dot(kr, yr, precision=prec, preferred_element_type=f32)
        u2 = jnp.dot(ki, yi, precision=prec, preferred_element_type=f32)
        u3 = jnp.dot(ks, yr + yi, precision=prec, preferred_element_type=f32)
        zr = u1 - u2
        zi = u3 - u1 - u2
        # x̄ += conj(S_c) ⊙ ȳ
        xbr = xbr + (sr * ybr + si * ybi)
        xbi = xbi + (sr * ybi - si * ybr)
        # s̄_c += conj(g) ⊙ z + ȳ ⊙ conj(x)
        sbr_ref[0, ci] += gr * zr + gi * zi + ybr * xr + ybi * xi
        sbi_ref[0, ci] += gr * zi - gi * zr + ybi * xr - ybr * xi
    lam = lam_ref[0, 0]
    xbr_ref[0, 0] = xbr + lam * gr
    xbi_ref[0, 0] = xbi + lam * gi
    # λ̄ partial for this (b, t): Re⟨g, x⟩
    lb_ref[0, 0] = jnp.sum(gr * xr + gi * xi)


def _specs(b, t, c, h, w, kt):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x_spec = pl.BlockSpec((1, 1, h, w), lambda bi, ti: (bi, ti, 0, 0),
                          memory_space=pltpu.VMEM)
    if kt > 1:
        k_spec = pl.BlockSpec((1, 1, h, h), lambda bi, ti: (bi, ti, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        k_spec = pl.BlockSpec((1, 1, h, h), lambda bi, ti: (bi, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, c, h, w), lambda bi, ti: (bi, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    lam_spec = pl.BlockSpec((1, 1), lambda bi, ti: (0, 0),
                            memory_space=pltpu.SMEM)
    return x_spec, k_spec, s_spec, lam_spec


def fwd_pallas_call(xr, xi, kr, ki, sr, si, lam):
    import jax.experimental.pallas as pl

    b, t, h, w = xr.shape
    c = sr.shape[1]
    kt = kr.shape[1]
    x_spec, k_spec, s_spec, lam_spec = _specs(b, t, c, h, w, kt)
    lam = jnp.asarray(lam, jnp.float32).reshape(1, 1)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, c),
        grid=(b, t),
        in_specs=[x_spec, x_spec, k_spec, k_spec, s_spec, s_spec, lam_spec],
        out_specs=(x_spec, x_spec),
        out_shape=(
            jax.ShapeDtypeStruct(xr.shape, jnp.float32),
            jax.ShapeDtypeStruct(xr.shape, jnp.float32),
        ),
        interpret=_INTERPRET,
    )(xr, xi, kr, ki, sr, si, lam)


def _bwd_pallas_call(xr, xi, gr, gi, kr, ki, sr, si, lam):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, h, w = xr.shape
    c = sr.shape[1]
    kt = kr.shape[1]
    x_spec, k_spec, s_spec, lam_spec = _specs(b, t, c, h, w, kt)
    sb_spec = pl.BlockSpec((1, c, h, w), lambda bi, ti: (bi, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    lb_spec = pl.BlockSpec((1, 1), lambda bi, ti: (bi, ti),
                           memory_space=pltpu.SMEM)
    lam = jnp.asarray(lam, jnp.float32).reshape(1, 1)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, c),
        grid=(b, t),
        in_specs=[x_spec, x_spec, x_spec, x_spec, k_spec, k_spec,
                  s_spec, s_spec, lam_spec],
        out_specs=(x_spec, x_spec, sb_spec, sb_spec, lb_spec),
        out_shape=(
            jax.ShapeDtypeStruct(xr.shape, jnp.float32),
            jax.ShapeDtypeStruct(xr.shape, jnp.float32),
            jax.ShapeDtypeStruct(sr.shape, jnp.float32),
            jax.ShapeDtypeStruct(sr.shape, jnp.float32),
            jax.ShapeDtypeStruct((b, t), jnp.float32),
        ),
        interpret=_INTERPRET,
    )(xr, xi, gr, gi, kr, ki, sr, si, lam)


@jax.custom_vjp
def normal_apply_pallas(xr, xi, kr, ki, sr, si, lam):
    """``out = Σ_c conj(S_c)⊙(K(S_c⊙x)) + λx`` on raw (re, im) f32 arrays.

    Shapes: ``x (b,t,h,w)``, ``K (b,{1|t},h,h)``, ``S (b,c,h,w)``, ``lam``
    scalar. Returns ``(out_re, out_im)``. The K cotangent is defined as
    zero (K derives from the never-learned mask; the operators.py call
    site stop-gradients it).
    """
    return fwd_pallas_call(xr, xi, kr, ki, sr, si, lam)


def _vjp_fwd(xr, xi, kr, ki, sr, si, lam):
    out = fwd_pallas_call(xr, xi, kr, ki, sr, si, lam)
    return out, (xr, xi, kr, ki, sr, si, lam)


def _vjp_bwd(res, g):
    xr, xi, kr, ki, sr, si, lam = res
    gr, gi = g
    xbr, xbi, sbr, sbi, lb = _bwd_pallas_call(
        xr, xi, gr, gi, kr, ki, sr, si, lam
    )
    lam_bar = jnp.sum(lb)
    return (xbr, xbi, jnp.zeros_like(kr), jnp.zeros_like(ki),
            sbr, sbi, lam_bar)


normal_apply_pallas.defvjp(_vjp_fwd, _vjp_bwd)
