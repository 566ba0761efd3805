"""Rematerialization policy control for the cascade/iteration scans.

Every unrolled family wraps its scanned block in ``nn.remat`` so training
memory is bounded at one cascade's activations (the reference relies on
torch keeping ALL cascade activations live — varnet.py:138-151 — which is
exactly what does not scale on a 16 GB HBM chip). ``nn.remat`` with no
policy saves *nothing* per cascade and replays the whole cascade forward
inside the backward pass; a checkpoint policy picks intermediates to keep,
trading HBM residency for replay FLOPs/bandwidth.

Policies (``remat_policy`` on the model classes; swept on the chip by
``bench/train_step.py --remat_policy``, results in BASELINE.md
"Train-step remat-policy sweep"). Round-5 sweep outcome on the flagship
at protocol shape: **full replay wins** — every saving policy is 10-43%
slower (the backward is HBM-bandwidth-bound, so spilling checkpointed
activations costs more than recomputing the fused forward chain), and
disabling remat outright fails to compile at 10 cascades. The policies
stay selectable for parts where the trade can flip (bigger HBM, smaller
models, FLOP-bound regimes).

* ``""``       — save nothing (full replay). The default; sweep winner.
* ``"dots"``   — ``jax.checkpoint_policies.dots_with_no_batch_dims_saveable``:
  keep non-batched matmul outputs (the DFT/DC-kernel contractions).
* ``"dots_batch"`` — ``dots_saveable``: keep every dot_general output.
* ``"convs"``  — ``save_only_these_names('conv_out')``: keep the outputs of
  every convolution in the denoiser stacks (tagged by
  :func:`tag_conv_out`), so the backward replay re-runs only the cheap
  elementwise/norm chains, never the MXU convs.

``prevent_cse``: flax defaults to True, which inserts optimization
barriers so XLA cannot common-subexpression-eliminate the replayed
forward. Inside ``nn.scan`` these barriers are unnecessary (the JAX
checkpoint docs: under jit-of-scan, ``prevent_cse=False`` is safe) and
they block fusion across the replay boundary, so the sweep exposes it.
"""

from __future__ import annotations

import flax.linen as nn
import jax
from jax.ad_checkpoint import checkpoint_name

__all__ = ["REMAT_POLICIES", "resolve_remat_policy", "wrap_remat", "tag_conv_out"]

REMAT_POLICIES = ("", "dots", "dots_batch", "convs")


def resolve_remat_policy(name: str):
    """Map a policy name to a ``jax.checkpoint`` policy callable (or None)."""
    if not name:
        return None
    cp = jax.checkpoint_policies
    table = {
        "dots": cp.dots_with_no_batch_dims_saveable,
        "dots_batch": cp.dots_saveable,
        "convs": cp.save_only_these_names("conv_out"),
    }
    if name not in table:
        raise ValueError(f"remat_policy must be one of {REMAT_POLICIES}, got {name!r}")
    return table[name]


def wrap_remat(block_cls, remat: bool, policy: str = "", prevent_cse: bool = True):
    """``nn.remat`` the scanned block class under the named policy.

    ``remat=False`` returns the class unwrapped (all activations saved —
    fastest when they fit in HBM).
    """
    if not remat:
        return block_cls
    return nn.remat(
        block_cls,
        policy=resolve_remat_policy(policy),
        prevent_cse=prevent_cse,
    )


def tag_conv_out(x):
    """Name a convolution output for the ``"convs"`` remat policy.

    A no-op unless the surrounding ``jax.checkpoint`` uses
    ``save_only_these_names('conv_out')``; costs nothing when unused.
    """
    return checkpoint_name(x, "conv_out")
