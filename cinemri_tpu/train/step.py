"""Jitted train / eval steps shared by all three model families.

Replaces the reference's per-family Lightning ``training_step`` /
``validation_step`` / ``test_step`` triples (varnet_module.py:97-149,
cinenet_module.py:88-140, xpdnet_module.py:139-191), which differ only in
whether the batch carries precomputed sensitivity maps. The loss recipe is
identical: crop output and target to the common center size, then the
time-averaged SSIM loss.

The steps are pure functions of ``(state, batch)`` so one ``jax.jit`` with
sharded batch inputs covers single-chip and data-parallel mesh execution —
the SPMD partitioner inserts the gradient all-reduce that Lightning's
DDP/NCCL wrapper provides in the reference.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from cinemri_tpu.data.transforms import center_crop_to_smallest
from cinemri_tpu.ops.ssim import ssim_loss

__all__ = ["TrainState", "create_train_state", "make_train_step", "make_eval_step"]


class TrainState(train_state.TrainState):
    """Params + optimizer state + step counter (flax TrainState)."""


def model_apply_fn(model) -> Callable:
    """Adapter: batches are dicts; CineNet-style batches carry sens_maps."""

    def apply(params, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        args = (batch["masked_kspace"], batch["mask"])
        if "sens_maps" in batch:
            args = args + (batch["sens_maps"],)
        return model.apply(params, *args)

    return apply


def create_train_state(
    model,
    example_batch,
    tx: optax.GradientTransformation,
    rng=None,
    torch_init: bool = True,
):
    """Initialize params + optimizer state.

    ``torch_init`` (default on) re-draws conv/dense kernels and biases with
    the reference's torch ``reset_parameters`` statistics
    (kaiming_uniform(a=sqrt(5)) == uniform(±1/sqrt(fan_in))) so
    training-from-scratch matches the reference's initial weight
    distribution instead of flax's lecun_normal (design.md §8 deviation #1).
    """
    rng = jax.random.PRNGKey(42) if rng is None else rng
    args = (example_batch["masked_kspace"], example_batch["mask"])
    if "sens_maps" in example_batch:
        args = args + (example_batch["sens_maps"],)
    # jit the initializer: on remote-dispatch TPU backends an eager init
    # would round-trip per op
    init_rng, reinit_rng = jax.random.split(rng)
    params = jax.jit(model.init)(init_rng, *args)
    if torch_init:
        from cinemri_tpu.models.init import torch_style_init

        params = jax.jit(torch_style_init)(params, reinit_rng)
    return TrainState.create(apply_fn=model_apply_fn(model), params=params, tx=tx)


def _loss_and_output(apply, params, batch) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    output = apply(params, batch)
    target, output_c = center_crop_to_smallest(batch["target"], output)
    # padded trailing batches carry sample_weight 0 on the padding so the
    # repeated sample is not double-counted in the gradient (the reference's
    # DataLoader emits a smaller final batch instead)
    loss = ssim_loss(output_c, target, sample_weight=batch.get("sample_weight"))
    return loss, output_c, target


def make_train_step(
    donate: bool = True, mesh=None, data_axis: str = "data"
) -> Callable:
    """(state, batch) -> (state, aux dict with loss/output/target).

    With ``mesh=None`` (or a mesh without a pure ``data`` axis layout) the
    step is a plain ``jax.jit`` and the SPMD partitioner derives the
    collectives from the input shardings. That is correct but NOT optimally
    scheduled for the scanned families: the cascade regularizer weights are
    scan-broadcast (``variable_broadcast='params'``), so the partitioner
    places the shared-weight gradient all-reduce INSIDE the backward scan
    body — one small latency-bound all-reduce per cascade per step instead
    of one per step (verified by HLO inspection,
    tests/test_parallel.py::TestCompiledCollectives).

    Passing a pure data-parallel ``mesh`` (axes == {data_axis}, the v5e-8
    north-star layout) switches to an explicit ``jax.shard_map`` schedule:
    each chip computes the loss and gradient of ITS batch shard with zero
    communication, then the full gradient tree is ``psum``'d ONCE and the
    (replicated) optimizer update is applied identically everywhere — the
    textbook DP schedule, with per-step collective bytes exactly equal to
    the gradient tree (plus two scalar psums for the loss). Numerically
    equivalent to the jit path (same weighted-mean loss; gradient sums
    merely reassociate) — asserted by
    tests/test_parallel.py::test_sharded_step_matches_single_device.

    Multi-axis meshes (coil/plane tensor/sequence parallelism) keep the jit
    path: their in-model sharding constraints need the partitioner.
    """

    def train_step(state: TrainState, batch):
        def loss_fn(params):
            loss, output, target = _loss_and_output(state.apply_fn, params, batch)
            return loss, (output, target)

        (loss, (output, target)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        gnorm = optax.global_norm(grads)
        return state, {
            "loss": loss,
            "output": output,
            "target": target,
            "grad_norm": gnorm,
        }

    if mesh is None or set(mesh.axis_names) != {data_axis}:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    from jax.sharding import PartitionSpec as P

    def local_step(state: TrainState, batch):
        # global weight denominator first: it has no parameter dependence,
        # so the loss can be computed as a per-chip contribution whose psum
        # is the global weighted mean (gradients then psum the same way)
        w = batch.get("sample_weight")
        if w is None:
            w = jnp.ones((batch["target"].shape[0],), jnp.float32)
        gden = jnp.maximum(jax.lax.psum(jnp.sum(w), data_axis), 1.0)

        def loss_fn(params):
            output = state.apply_fn(params, batch)
            target, output_c = center_crop_to_smallest(batch["target"], output)
            from cinemri_tpu.ops.ssim import ssim_index_per_sample

            s = ssim_index_per_sample(output_c, target)  # (b_local, t)
            per_sample = jnp.mean(1.0 - s, axis=1)
            local_contrib = jnp.sum(per_sample * w.astype(per_sample.dtype)) / gden
            return local_contrib, (output_c, target)

        (local_loss, (output, target)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        loss = jax.lax.psum(local_loss, data_axis)
        grads = jax.lax.psum(grads, data_axis)  # THE one gradient all-reduce
        state = state.apply_gradients(grads=grads)
        gnorm = optax.global_norm(grads)
        return state, {
            "loss": loss,
            "output": output,
            "target": target,
            "grad_norm": gnorm,
        }

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        # state replicated; every batch leaf sharded on its leading (batch)
        # dim — P(data_axis) is a pytree prefix over the whole batch dict
        in_specs=(P(), P(data_axis)),
        out_specs=(
            P(),
            {"loss": P(), "output": P(data_axis), "target": P(data_axis),
             "grad_norm": P()},
        ),
        check_vma=False,  # replicated-state update is deterministic per chip
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_eval_step() -> Callable:
    """(state, batch) -> aux dict with loss/output/target (no grad)."""

    def eval_step(state: TrainState, batch):
        loss, output, target = _loss_and_output(state.apply_fn, state.params, batch)
        return {"loss": loss, "output": output, "target": target}

    return jax.jit(eval_step)
