"""Ahead-of-time model export for serving.

Serializes a weight-bound reconstruction function to a StableHLO artifact
(``jax.export``) that a serving process can load and run **without the
model code or flax** — the deployment story the reference lacks entirely
(its only artifact is a Lightning .ckpt requiring the full source tree).
The exported function takes raw ``(kspace_re, kspace_im, mask)`` float32
arrays, so callers need no knowledge of the Complex pytree either.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from cinemri_tpu.ops.cplx import Complex

__all__ = [
    "export_model",
    "load_exported",
    "register_complex_serialization",
    "serial_batch",
]


def serial_batch(fn: Callable) -> Callable:
    """Wrap a single-volume forward into a batched one that reconstructs
    the volumes **sequentially on device** (``lax.map``).

    Why not just batch: at the reference protocol shape (15x10x200x200) a
    single volume already saturates the v5e chip — the per-cascade DFT-chain
    intermediates (~240 MB) stream at HBM speed-of-light and the U-Net
    activations stay VMEM-resident. Jointly batching multiplies those
    intermediates past VMEM capacity, XLA spills them to HBM with
    transposing copies, and latency scales superlinearly (measured: batch=4
    costs 5.2x batch=1; profile in BASELINE.md "Serving modes"). Mapping
    sequentially keeps the single-volume program and its VMEM residency:
    batch=n costs exactly n x batch=1 (measured 330 fps at batch=4 vs 319
    at batch=1), so batched serving never loses to single dispatch.

    Args:
        fn: single-volume forward taking batch-1 arrays/pytrees (leading
            axis 1), e.g. ``lambda k, m: model.apply(params, k, m)``.
    Returns:
        A callable with the same signature over batch-n inputs, jit-safe.
    """
    import jax

    def batched(*args):
        def one(sliced):
            unit = jax.tree.map(lambda a: a[None], sliced)
            out = fn(*unit)
            return jax.tree.map(lambda a: a[0], out)

        return jax.lax.map(one, args)

    return batched

_registered = False


def register_complex_serialization() -> None:
    """Register Complex with jax.export's pytree serializer (idempotent)."""
    global _registered
    if _registered:
        return
    from jax import export

    export.register_pytree_node_serialization(
        Complex,
        serialized_name="cinemri_tpu.Complex",
        serialize_auxdata=lambda aux: b"",
        deserialize_auxdata=lambda b: None,
    )
    _registered = True


def export_model(
    model,
    params,
    example_kspace: Complex,
    example_mask: jnp.ndarray,
    path: Optional[Union[str, Path]] = None,
    sens_maps: Optional[Complex] = None,
    serial: bool = False,
) -> bytes:
    """Export a weight-bound forward to a serialized StableHLO artifact.

    The weights are closed over (baked into the artifact); the exported
    callable's signature is ``(kspace_re, kspace_im, mask) -> image`` —
    plus ``(sens_re, sens_im)`` for CineNet-style models.

    ``serial=True`` wraps the forward in :func:`serial_batch` before
    exporting, so a batch-n example produces an artifact that reconstructs
    its volumes sequentially on device — the mode that wins at every batch
    size on the v5e (BASELINE.md "Serving modes").
    """
    register_complex_serialization()
    from jax import export

    apply_fn = model.apply

    if sens_maps is None:

        def unit(k, mask):
            return apply_fn(params, k, mask)

        wrapped = serial_batch(unit) if serial else unit

        def fn(kre, kim, mask):
            return wrapped(Complex(kre, kim), mask)

        args = (example_kspace.re, example_kspace.im, example_mask)
    else:

        def unit(k, mask, s):
            return apply_fn(params, k, mask, s)

        wrapped = serial_batch(unit) if serial else unit

        def fn(kre, kim, mask, sre, sim):
            return wrapped(Complex(kre, kim), mask, Complex(sre, sim))

        args = (
            example_kspace.re,
            example_kspace.im,
            example_mask,
            sens_maps.re,
            sens_maps.im,
        )

    exported = export.export(jax.jit(fn))(*args)
    blob = bytes(exported.serialize())
    if path is not None:
        Path(path).write_bytes(blob)
    return blob


def load_exported(source: Union[bytes, str, Path]) -> Callable:
    """Load a serialized artifact; returns f(kspace_re, kspace_im, mask, ...)."""
    register_complex_serialization()
    from jax import export

    if isinstance(source, (bytes, bytearray)):
        blob = bytes(source)
    else:
        blob = Path(source).read_bytes()
    exported = export.deserialize(blob)

    def fn(*args):
        return exported.call(*[jnp.asarray(a) for a in args])

    return fn
