"""Optimizer construction: Adam + step-decay schedule.

Parity target: reference configure_optimizers (varnet_module.py:151-159):
``torch.optim.Adam(lr, weight_decay)`` + ``StepLR(step_size, gamma)`` where
the step size counts *epochs* (defaults lr=1e-4, step=140, γ=0.01 from the
train scripts). torch's Adam ``weight_decay`` adds ``wd·θ`` to the gradient
before the moment updates — ``optax.add_decayed_weights`` in front of
``adam`` reproduces that exactly (this is not AdamW).
"""

from __future__ import annotations

import optax

__all__ = ["step_decay_schedule", "make_optimizer"]


def step_decay_schedule(
    lr: float, step_size_epochs: int, gamma: float, steps_per_epoch: int
):
    """lr · γ^(epoch // step_size), with epoch derived from the step count."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return lr * gamma ** (epoch // step_size_epochs)

    return schedule


def make_optimizer(
    lr: float = 1e-4,
    lr_step_size: int = 140,
    lr_gamma: float = 0.01,
    weight_decay: float = 0.0,
    steps_per_epoch: int = 1,
    clip_grad_norm: float = 0.0,
) -> optax.GradientTransformation:
    """Adam + StepLR (varnet_module.py:151-159 semantics).

    ``clip_grad_norm`` (0 = off, the reference recipe) prepends
    ``optax.clip_by_global_norm``. The reference trains WITHOUT clipping
    and its architecture admits rare catastrophic gradient spikes — the
    round-5 full-protocol run hit a single 2e5-norm gradient (sens-net
    NormUnet subtree, deterministic replay in BASELINE.md) that poisoned
    Adam's moments and cost the run ~0.2 SSIM. Clipping is the standard
    mitigation; it is opt-in because it changes the trained function
    relative to the reference recipe.
    """
    schedule = step_decay_schedule(lr, lr_step_size, lr_gamma, steps_per_epoch)
    parts = []
    if clip_grad_norm > 0:
        parts.append(optax.clip_by_global_norm(clip_grad_norm))
    if weight_decay > 0:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.adam(schedule))
    return parts[0] if len(parts) == 1 else optax.chain(*parts)
