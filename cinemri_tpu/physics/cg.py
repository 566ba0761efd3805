"""Conjugate-gradient solver with on-device scalars.

Parity target: reference reconstruction/models/cinenet.py:136-171 — a fixed
number of CG iterations on ``H x = b`` with the inner products taken over
the *real* view of the complex tensors (the reference stores complex as
stacked reals, so ``torch.dot(r.flatten(), r.flatten())`` is ``Re⟨r, r⟩``).

TPU-first difference: the reference syncs ``alpha.item()`` / ``beta.item()``
to the host every iteration (cinenet.py:159-169 — a full device round-trip
per CG step, per cascade). Here the loop is a ``lax.fori_loop`` whose step
sizes stay on device, so the whole unrolled network compiles to one XLA
program with zero host syncs.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from jax import lax

__all__ = ["conj_grad"]


def _real_dot(u, v) -> jnp.ndarray:
    """Re⟨u, v⟩ — matches the reference's real-flattened torch.dot."""
    from cinemri_tpu.ops.cplx import Complex, real_dot

    if isinstance(u, Complex):
        return real_dot(u, v)
    if jnp.iscomplexobj(u):
        return jnp.sum(u.real * v.real + u.imag * v.imag)
    return jnp.sum(u * v)


def conj_grad(
    operator: Callable[[jnp.ndarray], jnp.ndarray],
    rhs: jnp.ndarray,
    x0: jnp.ndarray,
    iters: int,
) -> jnp.ndarray:
    """Run ``iters`` CG steps on ``operator(x) = rhs`` starting from ``x0``."""
    r0 = rhs - operator(x0)
    state0 = (x0, r0, r0, _real_dot(r0, r0))

    def _safe_div(a, b):
        # The reference divides unguarded (fine at its 4-6 iterations); at
        # higher iteration counts a fully converged residual makes 0/0 in
        # f32, so treat an exhausted residual as a zero step instead.
        return jnp.where(b != 0, a / jnp.where(b != 0, b, 1.0), 0.0)

    def body(_, state):
        x, r, p, rs_old = state
        d = operator(p)
        alpha = _safe_div(rs_old, _real_dot(p, d))
        x = x + alpha * p
        r = r - alpha * d
        rs_new = _real_dot(r, r)
        beta = _safe_div(rs_new, rs_old)
        p = r + beta * p
        return (x, r, p, rs_new)

    x, _, _, _ = lax.fori_loop(0, iters, body, state0)
    return x
