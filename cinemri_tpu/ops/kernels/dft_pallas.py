"""Fused complex DFT matmul as a Pallas TPU kernel.

The centered-DFT matmul is the hot op of every unrolled cascade (~90% of
the flagship forward). The XLA path (ops/fft.py) issues three separate
HIGHEST-precision matmuls (Gauss's trick) with HBM-resident intermediates;
this kernel loads each x tile into VMEM once, runs all three MXU dots and
the combine arithmetic on-chip, and writes only the two output components —
one HBM round-trip for the whole complex product.

Computes, for row-blocks of x: ``y = x @ (wr + i wi)ᵀ`` on (re, im) pairs:

    t1 = xr @ wrᵀ;  t2 = xi @ wiᵀ;  t3 = (xr + xi) @ (wr + wi)ᵀ
    y_re = t1 - t2;  y_im = t3 - t1 - t2

Weights (N x N, N <= ~512) stay resident in VMEM across the row grid.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["complex_dft_matmul_pallas", "pallas_available"]

_ROW_TILE = 512


@functools.lru_cache(maxsize=1)
def pallas_available() -> bool:
    """Probe once whether Pallas compiles and runs on this backend."""
    try:
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401

        def k(x_ref, o_ref):
            o_ref[:] = x_ref[:] + 1.0

        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
        )(jnp.zeros((8, 128), jnp.float32))
        return bool(np.asarray(out)[0, 0] == 1.0)
    except Exception:
        return False


def _kernel(xr_ref, xi_ref, wrt_ref, wit_ref, wst_ref, or_ref, oi_ref):
    import jax.experimental.pallas as pl  # noqa: F401

    prec = jax.lax.Precision.HIGHEST
    xr = xr_ref[:]
    xi = xi_ref[:]
    t1 = jnp.dot(xr, wrt_ref[:], precision=prec, preferred_element_type=jnp.float32)
    t2 = jnp.dot(xi, wit_ref[:], precision=prec, preferred_element_type=jnp.float32)
    t3 = jnp.dot(
        xr + xi, wst_ref[:], precision=prec, preferred_element_type=jnp.float32
    )
    or_ref[:] = t1 - t2
    oi_ref[:] = t3 - t1 - t2


def complex_dft_matmul_pallas(
    xr: jnp.ndarray,
    xi: jnp.ndarray,
    wr: np.ndarray,
    wi: np.ndarray,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, N) x (N, N) complex product ``y[b, j] = Σ_k w[j, k] x[b, k]``.

    ``xr/xi``: (B, N) device arrays; ``wr/wi``: (N, N) host DFT matrices.
    Returns (y_re, y_im), each (B, N).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n = xr.shape
    tile = min(_ROW_TILE, b)
    pad = (-b) % tile
    if pad:
        xr = jnp.pad(xr, ((0, pad), (0, 0)))
        xi = jnp.pad(xi, ((0, pad), (0, 0)))
    grid = (xr.shape[0] // tile,)

    wrt = jnp.asarray(np.ascontiguousarray(wr.T))
    wit = jnp.asarray(np.ascontiguousarray(wi.T))
    wst = jnp.asarray(np.ascontiguousarray((wr + wi).T))

    row_spec = pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)

    yr, yi = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[row_spec, row_spec, w_spec, w_spec, w_spec],
        out_specs=(row_spec, row_spec),
        out_shape=(
            jax.ShapeDtypeStruct(xr.shape, jnp.float32),
            jax.ShapeDtypeStruct(xr.shape, jnp.float32),
        ),
        interpret=interpret,
    )(xr, xi, wrt, wit, wst)
    if pad:
        yr = yr[:b]
        yi = yi[:b]
    return yr, yi
