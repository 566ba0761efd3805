"""Coil combination (reference reconstruction/utils/coil_combine.py:5-34)."""

from __future__ import annotations

import jax.numpy as jnp

from cinemri_tpu.ops.complex import complex_abs_sq

__all__ = ["rss", "rss_complex"]


def rss(x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Root-sum-of-squares over the coil axis for real input."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis))


def rss_complex(x, axis: int = 0) -> jnp.ndarray:
    """Root-sum-of-squares over the coil axis (Complex pair or complex array)."""
    from cinemri_tpu.ops.cplx import Complex

    if isinstance(x, Complex):
        return jnp.sqrt(jnp.sum(x.abs_sq(), axis=axis))
    return jnp.sqrt(jnp.sum(complex_abs_sq(x), axis=axis))
