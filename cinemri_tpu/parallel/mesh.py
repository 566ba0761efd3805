"""Device mesh construction and batch sharding.

The reference reaches distribution through Lightning's DP/DDP backends over
NCCL/Gloo (train_test_varnet.py:148-149,286-297; volume_sampler.py;
DistributedMetricSum). The TPU-native equivalent (SURVEY §2b) is an explicit
``jax.sharding.Mesh``: the batch axis is sharded over the ``data`` axis, the
model is replicated, and jit's SPMD partitioner emits the gradient
all-reduce over ICI — no communication code in the model.

An optional ``plane`` axis demonstrates the XT/XF sequence-parallel layout:
the rotated-plane batches (b·h independent (w,t) images per cascade,
varnet.py:216-217) are embarrassingly parallel and can be sharded across
chips with no halo exchange (SURVEY §5 long-context notes). An optional
``coil`` axis shards the receive-coil dimension (tensor parallelism —
:func:`cinemri_tpu.physics.constrain_coil_axis`); both compose with
``data`` on a 2-D mesh.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "batch_partition_spec",
    "ARRAY_KEYS",
]

ARRAY_KEYS = ("masked_kspace", "mask", "target", "sens_maps", "sample_weight")

# Which batch fields carry a receive-coil dimension, and where. When the
# mesh has a ``coil`` axis these dims are sharded at array-CREATION time so
# the global arrays enter the jitted step already laid out the way the
# models' constrain_coil_axis constraints want them. Without this, XLA's
# SPMD partitioner cannot reshard data-sharded inputs onto the coil axis
# efficiently and falls back to "involuntary full rematerialization" —
# replicate the full k-space tensor over ICI, then re-partition — on the
# framework's hottest input, every step (observed in MULTICHIP_r03).
_COIL_DIMS = {"masked_kspace": 2, "sens_maps": 2}


def make_mesh(
    shape: Optional[Dict[str, int]] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a mesh; default: all devices on one ``data`` axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = {"data": len(devices)}
    names = tuple(shape.keys())
    dims = tuple(shape.values())
    if int(np.prod(dims)) != len(devices):
        raise ValueError(f"mesh {shape} needs {np.prod(dims)} devices, have {len(devices)}")
    return Mesh(np.asarray(devices).reshape(dims), names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_partition_spec(
    key: str, shape: Sequence[int], mesh: Mesh, axis: str = "data",
    global_rows: Optional[int] = None,
) -> P:
    """The PartitionSpec a batch field should be CREATED with on ``mesh``.

    Dim 0 (batch) shards over ``axis`` when the global row count divides
    the axis size; a ``coil`` mesh axis additionally claims the coil dim of
    coil-carrying fields (``_COIL_DIMS``) when the coil count divides it.
    This is the same layout the models' in-program constraints
    (physics.constrain_coil_axis) impose, so inputs arrive pre-sharded and
    the SPMD partitioner never has to replicate-then-repartition them.
    The ``plane`` axis claims no input dim: XT/XF plane batches are derived
    (b·h) reshapes that only exist inside the program.
    """
    spec = [None] * len(shape)
    rows = shape[0] if global_rows is None else global_rows
    if axis in mesh.shape and rows % mesh.shape[axis] == 0:
        spec[0] = axis
    coil_dim = _COIL_DIMS.get(key)
    if (
        coil_dim is not None
        and "coil" in mesh.shape
        and len(shape) > coil_dim
        and shape[coil_dim] % mesh.shape["coil"] == 0
        and shape[coil_dim] > 1
    ):
        spec[coil_dim] = "coil"
    while spec and spec[-1] is None:  # P('data') == P('data', None) is False
        spec.pop()
    return P(*spec)


def shard_batch(batch: Dict, mesh: Optional[Mesh], axis: str = "data") -> Dict:
    """Device-put array fields, sharding the leading (batch) axis when it
    divides the mesh axis size; everything else is replicated.

    On a mesh with a ``coil`` axis, the coil dimension of coil-carrying
    fields is also sharded at creation time (:func:`batch_partition_spec`)
    so the global arrays already match the models' coil-axis constraints.

    Host-side complex arrays become :class:`~cinemri_tpu.ops.cplx.Complex`
    (re, im) pairs here — complex dtypes never reach the device.

    On a mesh spanning multiple processes, each process passes its **local**
    rows (the shard its Loader produced with ``num_replicas=process_count``)
    and the global batch is assembled with
    ``jax.make_array_from_process_local_data`` — the jit'd step then runs
    SPMD over all hosts with the gradient all-reduce riding ICI/DCN (the
    reference's DDP+NCCL, train_test_varnet.py:288-290).
    """
    from cinemri_tpu.ops.cplx import Complex

    import jax.numpy as jnp

    multiprocess = mesh is not None and len(mesh.devices.flat) > jax.local_device_count()

    def place(v, sh):
        if sh is None:
            return jnp.asarray(v)
        if multiprocess:
            return jax.make_array_from_process_local_data(sh, np.asarray(v))
        return jax.device_put(v, sh)

    def to_device(v, sh):
        if np.iscomplexobj(v):
            v = Complex(
                np.ascontiguousarray(np.asarray(v).real, dtype=np.float32),
                np.ascontiguousarray(np.asarray(v).imag, dtype=np.float32),
            )
        if isinstance(v, Complex):
            return jax.tree.map(lambda a: place(a, sh), v)
        return place(v, sh)

    out = {}
    for k in ARRAY_KEYS:
        if k not in batch:
            continue
        v = batch[k]
        if mesh is None:
            out[k] = to_device(v, None)
        else:
            rows = v.shape[0] * (jax.process_count() if multiprocess else 1)
            spec = batch_partition_spec(k, v.shape, mesh, axis, global_rows=rows)
            out[k] = to_device(v, NamedSharding(mesh, spec))
    return out
