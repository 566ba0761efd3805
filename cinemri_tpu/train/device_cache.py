"""HBM-resident cache of per-sample training constants.

Cine training re-reads the same volumes every epoch; only the
undersampling mask changes per (epoch, volume) (the reference's
per-epoch random masking, transforms.py:327-330). The host pipeline
nevertheless used to re-transfer the full masked k-space
(~96 MB/sample as (re, im) f32) to the device every step. On TPU the
right layout is the opposite: the per-sample constants — raw k-space,
target, (stable) sensitivity maps — live in HBM for the whole run, and
the per-step host->device traffic is the ~12 KB mask; the mask multiply
(`data * mask + 0.0`, transforms.py:90) happens on device, fused by XLA
into the first consumer.

Two reasons this is load-bearing rather than a micro-optimization:

1. **Bandwidth**: it removes ~2 GB/epoch of H2D traffic at the protocol
   shape (20 volumes) — which on remote-dispatch backends (the axon
   tunnel) was a visible slice of the epoch wall-clock.
2. **A measured platform leak**: this container's axon PJRT client leaks
   the host staging copy of EVERY device transfer (~46 MB per fresh
   48 MB put; minimal reproducer in BASELINE.md "Full-protocol-scale
   training run" — `jnp.asarray(fresh_numpy)` grows RSS linearly with
   `jax.live_arrays()` constant, with or without execution, and
   `jax.clear_caches()` does not reclaim it). At protocol scale that is
   ~1 GB/epoch of host RSS and an OOM near epoch 110 of 150. Keeping
   the big arrays device-resident bounds the leak to the mask bytes.

The cache is LRU-bounded by an HBM byte budget (the protocol working
set — 25 volumes — is ~2.5 GB against the 4 GB default). Eviction only
matters for datasets larger than the budget; re-putting an evicted
sample re-pays (and, on axon, re-leaks) its transfer, so sizing the
budget to the training working set is the intent, not a cap to tune.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable, Dict, Tuple

import numpy as np

__all__ = ["DeviceSampleCache"]


class DeviceSampleCache:
    """LRU map: hashable key -> dict of device arrays (Complex for
    complex inputs), bounded by total device bytes."""

    def __init__(self, budget_bytes: int = 4 << 30):
        self.budget = int(budget_bytes)
        self._entries: "OrderedDict[Tuple, Tuple[int, Dict]]" = OrderedDict()
        self._bytes = 0
        self.hits = 0
        self.misses = 0

    def __len__(self) -> int:
        return len(self._entries)

    @property
    def nbytes(self) -> int:
        return self._bytes

    def get(self, key, build: Callable[[], Dict[str, np.ndarray]]) -> Dict:
        """Return the device dict for ``key``, transferring via ``build()``
        (host arrays; complex becomes a Complex (re, im) pair) on miss."""
        hit = self._entries.get(key)
        if hit is not None:
            self._entries.move_to_end(key)
            self.hits += 1
            return hit[1]

        import jax.numpy as jnp

        from cinemri_tpu.ops.cplx import Complex, from_complex

        host = build()
        dev: Dict[str, object] = {}
        nbytes = 0
        for name, value in host.items():
            if value is None:
                dev[name] = None
                continue
            value = np.asarray(value)
            if np.iscomplexobj(value):
                placed = from_complex(value.astype(np.complex64, copy=False))
                nbytes += placed.re.nbytes + placed.im.nbytes
            else:
                placed = jnp.asarray(value)
                nbytes += placed.nbytes
            dev[name] = placed
        self.misses += 1
        self._entries[key] = (nbytes, dev)
        self._bytes += nbytes
        while self._bytes > self.budget and len(self._entries) > 1:
            _, (freed, _dropped) = self._entries.popitem(last=False)
            self._bytes -= freed
        return dev
