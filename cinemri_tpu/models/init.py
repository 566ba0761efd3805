"""Torch-style parameter initialization.

flax's default init is lecun_normal; the reference's torch layers use
kaiming_uniform(a=sqrt(5)) kernels and uniform(±1/sqrt(fan_in)) biases
(torch.nn.Conv*d reset_parameters). Both bounds reduce to ±1/sqrt(fan_in),
with fan_in = in_channels x prod(kernel spatial dims). This helper rewrites
an initialized params tree with that distribution, giving
training-from-scratch runs the same weight statistics as the reference
(design.md §8 deviation #1). Scalar/vector parameters that the reference
initializes explicitly (e.g. ``lambda_reg``) are left untouched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["torch_style_init"]


def torch_style_init(params, rng: jax.Array):
    """Return ``params`` re-drawn with torch Conv/Dense init statistics."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(rng, len(flat))

    # fan_in per module dict: biases use their sibling kernel's fan_in
    def fan_in_of(kernel_shape):
        fan = 1
        for d in kernel_shape[:-1]:
            fan *= d
        return max(fan, 1)

    # map each bias path to its module's kernel shape
    kernel_shapes = {}
    for path, leaf in flat:
        names = [getattr(p, "key", None) for p in path]
        if names and names[-1] == "kernel":
            kernel_shapes[tuple(names[:-1])] = leaf.shape

    out = []
    for (path, leaf), key in zip(flat, keys):
        names = [getattr(p, "key", None) for p in path]
        last = names[-1] if names else None
        if last == "kernel" and leaf.ndim >= 2:
            bound = 1.0 / jnp.sqrt(fan_in_of(leaf.shape))
        elif last == "bias" and tuple(names[:-1]) in kernel_shapes:
            bound = 1.0 / jnp.sqrt(fan_in_of(kernel_shapes[tuple(names[:-1])]))
        else:
            out.append(leaf)  # e.g. lambda_reg: explicit reference init
            continue
        out.append(
            jax.random.uniform(key, leaf.shape, leaf.dtype, -bound, bound)
        )
    return jax.tree_util.tree_unflatten(treedef, out)
