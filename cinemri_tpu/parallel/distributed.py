"""Multi-host (multi-process) support.

The reference reaches multi-process training through Lightning DDP +
torch.distributed (NCCL), with rank-aware samplers and metric reduction
(SURVEY §2b). The JAX equivalents:

  * :func:`initialize` — ``jax.distributed.initialize`` wrapper; after it,
    ``jax.devices()`` spans all hosts and the same jit'd train step
    all-reduces over ICI/DCN with no further code.
  * :func:`process_info` — (process_index, process_count) for host-side
    data sharding (each host feeds its slice of the example list through
    :func:`cinemri_tpu.data.sharding.volume_shard_indices` /
    ``data_shard_indices`` with ``num_replicas=process_count``).
  * :func:`make_process_sum` — the ``DistributedMetricSum`` analogue
    (mri_module.py:22-32): a callable summing host-side scalars across
    processes, for :class:`~cinemri_tpu.train.metrics_agg.MetricsAggregator`'s
    ``reduce_fn``. Identity on a single process.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import numpy as np

__all__ = ["initialize", "process_info", "make_process_sum"]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize multi-host JAX; returns (process_index, process_count).

    With no arguments, relies on the cluster environment (TPU pods
    auto-discover). Safe to call on a single host (no-op)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return process_info()


def process_info() -> Tuple[int, int]:
    return jax.process_index(), jax.process_count()


def make_process_sum() -> Callable[[float], float]:
    """Scalar all-reduce-sum across processes (identity on one process)."""
    if jax.process_count() == 1:
        return lambda x: float(x)

    from jax.experimental import multihost_utils

    def reduce_fn(x: float) -> float:
        arr = multihost_utils.process_allgather(np.asarray(x, np.float64))
        return float(np.sum(arr))

    return reduce_fn
