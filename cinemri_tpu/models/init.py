"""Torch-style parameter initialization.

flax's default init is lecun_normal; the reference's torch layers use
kaiming_uniform(a=sqrt(5)) kernels and uniform(±1/sqrt(fan_in)) biases
(torch.nn.Conv*d reset_parameters). Both bounds reduce to ±1/sqrt(fan_in),
with fan_in = in_channels x prod(kernel spatial dims). This helper rewrites
an initialized params tree with that distribution, giving
training-from-scratch runs the same weight statistics as the reference
(design.md §8 deviation #1). Scalar/vector parameters that the reference
initializes explicitly (e.g. ``lambda_reg``) are left untouched.

Fused sum-of-convs (``denoisers.crnn.fused_sum_conv``) replace N separate
reference convs with one conv over concatenated inputs; their module names
carry a ``__f<s0>_<s1>...`` suffix with the per-input channel sizes, and
this initializer re-draws each kernel slice with the fan-in of the conv it
replaces (and the bias as a sum of the per-conv bias draws), so scratch
training starts from the reference's statistics exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["torch_style_init"]


def torch_style_init(params, rng: jax.Array):
    """Return ``params`` re-drawn with torch Conv/Dense init statistics."""
    from cinemri_tpu.models.denoisers.crnn import fused_slice_sizes

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

    def fused_kernel(key, shape, dtype, sizes, spatial):
        parts = []
        for s, k in zip(sizes, jax.random.split(key, len(sizes))):
            bound = 1.0 / jnp.sqrt(spatial * s)
            parts.append(
                jax.random.uniform(k, shape[:-2] + (s, shape[-1]), dtype, -bound, bound)
            )
        return jnp.concatenate(parts, axis=-2)

    def fused_bias(key, shape, dtype, sizes, spatial):
        total = jnp.zeros(shape, dtype)
        for s, k in zip(sizes, jax.random.split(key, len(sizes))):
            bound = 1.0 / jnp.sqrt(spatial * s)
            total = total + jax.random.uniform(k, shape, dtype, -bound, bound)
        return total

    out = []
    for (path, leaf), key in zip(flat, keys):
        names = [getattr(p, "key", None) for p in path]
        last = names[-1] if names else None
        module = names[-2] if len(names) >= 2 else None
        sizes = fused_slice_sizes(module) if isinstance(module, str) else None
        if last == "kernel" and leaf.ndim >= 2:
            if sizes is not None:
                spatial = fan_in_of(leaf.shape[:-2] + (1, 1))  # k*k
                out.append(fused_kernel(key, leaf.shape, leaf.dtype, sizes, spatial))
                continue
            bound = 1.0 / jnp.sqrt(fan_in_of(leaf.shape))
        elif last == "bias" and tuple(names[:-1]) in kernel_shapes:
            kshape = kernel_shapes[tuple(names[:-1])]
            if sizes is not None:
                spatial = fan_in_of(kshape[:-2] + (1, 1))
                out.append(fused_bias(key, leaf.shape, leaf.dtype, sizes, spatial))
                continue
            bound = 1.0 / jnp.sqrt(fan_in_of(kshape))
        else:
            out.append(leaf)  # e.g. lambda_reg: explicit reference init
            continue
        out.append(
            jax.random.uniform(key, leaf.shape, leaf.dtype, -bound, bound)
        )
    return jax.tree_util.tree_unflatten(treedef, out)
