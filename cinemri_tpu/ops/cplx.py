"""Complex arithmetic as a (re, im) pytree of real arrays.

The compute path carries complex data as :class:`Complex` — a registered
pytree pairing two float32 arrays — rather than native ``complex64``:

  * TPU backends (including the one this framework is benchmarked on) lower
    complex to real pairs anyway, and some expose **no** complex support at
    all; an explicit pair representation makes every op a first-class f32
    TPU op (VPU elementwise, MXU matmul), with mixed-precision control per
    component.
  * The reference does the same thing in spirit — trailing real/imag dim of
    size 2 (reconstruction/utils/math.py) — but re-slices and re-stacks that
    dim in every op; here the pair is structural, so XLA sees two clean f32
    tensors and fuses freely.

``Complex`` supports the arithmetic the physics needs (+, -, *, conj, abs,
division by reals), shape ops (reshape / transpose / indexing), and the
channel packing conventions of the denoisers. It composes transparently
with ``jit`` / ``grad`` / ``vmap`` / ``lax.scan`` / ``nn.scan`` because it
is a pytree.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Complex",
    "from_complex",
    "to_numpy",
    "csum",
    "cmean",
    "to_channels",
    "from_channels",
    "to_multi_channels",
    "from_multi_channels",
    "concat",
    "crepeat",
    "real_dot",
]

Real = Union[int, float, jnp.ndarray]


@jax.tree_util.register_pytree_node_class
class Complex:
    """A complex tensor stored as real/imag float arrays of equal shape."""

    __slots__ = ("re", "im")

    def __init__(self, re, im):
        self.re = re
        self.im = im

    # -- pytree protocol -------------------------------------------------
    def tree_flatten(self):
        return (self.re, self.im), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- array-ish surface -----------------------------------------------
    @property
    def shape(self):
        return self.re.shape

    @property
    def ndim(self):
        return self.re.ndim

    @property
    def dtype(self):
        return self.re.dtype

    def __repr__(self):
        return f"Complex(shape={getattr(self.re, 'shape', '?')}, dtype={getattr(self.re, 'dtype', '?')})"

    # -- arithmetic --------------------------------------------------------
    def __add__(self, other):
        if isinstance(other, Complex):
            return Complex(self.re + other.re, self.im + other.im)
        return Complex(self.re + other, self.im)

    __radd__ = __add__

    def __sub__(self, other):
        if isinstance(other, Complex):
            return Complex(self.re - other.re, self.im - other.im)
        return Complex(self.re - other, self.im)

    def __rsub__(self, other):
        return Complex(other - self.re, -self.im)

    def __neg__(self):
        return Complex(-self.re, -self.im)

    def __mul__(self, other):
        if isinstance(other, Complex):
            return Complex(
                self.re * other.re - self.im * other.im,
                self.re * other.im + self.im * other.re,
            )
        return Complex(self.re * other, self.im * other)

    __rmul__ = __mul__

    def __truediv__(self, other):
        if isinstance(other, Complex):
            d = other.re * other.re + other.im * other.im
            return self * Complex(other.re / d, -other.im / d)
        return Complex(self.re / other, self.im / other)

    def conj(self) -> "Complex":
        return Complex(self.re, -self.im)

    def abs(self) -> jnp.ndarray:
        return jnp.sqrt(self.re * self.re + self.im * self.im)

    def abs_sq(self) -> jnp.ndarray:
        return self.re * self.re + self.im * self.im

    # -- shape ops ---------------------------------------------------------
    def reshape(self, *shape) -> "Complex":
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        return Complex(self.re.reshape(shape), self.im.reshape(shape))

    def transpose(self, *axes) -> "Complex":
        if len(axes) == 1 and isinstance(axes[0], (tuple, list)):
            axes = tuple(axes[0])
        return Complex(self.re.transpose(axes), self.im.transpose(axes))

    def __getitem__(self, idx) -> "Complex":
        return Complex(self.re[idx], self.im[idx])

    def astype(self, dtype) -> "Complex":
        return Complex(self.re.astype(dtype), self.im.astype(dtype))


# -- constructors / converters ---------------------------------------------


def from_complex(x) -> Complex:
    """numpy/jnp complex array -> Complex pair (float32)."""
    if isinstance(x, Complex):
        return x
    if isinstance(x, np.ndarray):
        return Complex(
            jnp.asarray(np.ascontiguousarray(x.real), jnp.float32),
            jnp.asarray(np.ascontiguousarray(x.imag), jnp.float32),
        )
    return Complex(jnp.real(x).astype(jnp.float32), jnp.imag(x).astype(jnp.float32))


def to_numpy(x: Complex) -> np.ndarray:
    return np.asarray(x.re) + 1j * np.asarray(x.im)


# -- reductions / packing ----------------------------------------------------


def csum(x: Complex, axis=None, keepdims=False) -> Complex:
    return Complex(
        jnp.sum(x.re, axis=axis, keepdims=keepdims),
        jnp.sum(x.im, axis=axis, keepdims=keepdims),
    )


def cmean(x: Complex, axis=None, keepdims=False) -> Complex:
    return Complex(
        jnp.mean(x.re, axis=axis, keepdims=keepdims),
        jnp.mean(x.im, axis=axis, keepdims=keepdims),
    )


def to_channels(x: Complex) -> jnp.ndarray:
    """Complex (...,) -> real (..., 2) [re, im] trailing channels."""
    return jnp.stack([x.re, x.im], axis=-1)


def from_channels(r: jnp.ndarray) -> Complex:
    return Complex(r[..., 0], r[..., 1])


def to_multi_channels(x: Complex, axis: int = -1) -> jnp.ndarray:
    """Complex (..., n) -> real (..., 2n): first n re, last n im
    (the reference's complex_to_real_multi_ch packing, math.py:121-135)."""
    return jnp.concatenate([x.re, x.im], axis=axis)


def from_multi_channels(r: jnp.ndarray, axis: int = -1) -> Complex:
    re, im = jnp.split(r, 2, axis=axis)
    return Complex(re, im)


def concat(xs: Sequence[Complex], axis: int = -1) -> Complex:
    return Complex(
        jnp.concatenate([x.re for x in xs], axis=axis),
        jnp.concatenate([x.im for x in xs], axis=axis),
    )


def crepeat(x: Complex, n: int, axis: int) -> Complex:
    return Complex(jnp.repeat(x.re, n, axis=axis), jnp.repeat(x.im, n, axis=axis))


def real_dot(u: Complex, v: Complex) -> jnp.ndarray:
    """Re⟨u, v⟩ — the reference CG's real-flattened torch.dot."""
    return jnp.sum(u.re * v.re + u.im * v.im)
