"""Time-averaged differentiable SSIM loss.

Parity target: reference reconstruction/utils/losses.py:6-58, with its two
quirks replicated exactly (they define the training objective):

  * the ``data_range`` argument is *ignored* — each frame's dynamic range is
    recomputed as the max of that frame's **target batch** (losses.py:34
    overwrites the argument with ``Y.max()``);
  * covariance normalization ``NP/(NP-1)`` with a uniform ``win x win``
    window and VALID convolution.

TPU-first differences from the reference implementation: the per-frame
Python loop (losses.py:31-56, one conv2d call per frame) is folded into a
single batched uniform-window convolution over all frames at once (the t
loop is pure batching), and the hardcoded ``.to('cuda')`` is gone. At
batch>1 the loss is per-sample (per-sample data_range, weighted mean over
samples) — see :func:`ssim_loss`.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["ssim_loss", "ssim_index_per_frame", "ssim_index_per_sample"]


def _window_mean(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """Mean over a sliding win x win window, VALID; x: (n, h, w).

    Implemented as a 2-D convolution with a uniform kernel (the reference's
    ``F.conv2d`` with a ones/NP weight, losses.py:22): conv has first-class
    autodiff + SPMD-sharding support and maps onto the MXU, unlike
    ``lax.reduce_window`` whose reverse-mode rule rejects sharded operands.
    """
    kernel = jnp.full((1, 1, win, win), 1.0 / (win * win), dtype=x.dtype)
    s = lax.conv_general_dilated(
        x[:, None],  # (n, 1, h, w)
        kernel,
        window_strides=(1, 1),
        padding="VALID",
    )
    return s[:, 0]


def ssim_index_per_sample(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM per (sample, frame), shape (b, t).

    Args:
        pred/target: ``(b, t, h, w)`` real images.

    The per-frame data range is the per-sample frame max of the target
    (losses.py:34 computes the frame max over the whole batch, but the
    reference batch size is 1, where the two definitions coincide;
    per-sample keeps the loss independent of device batching — see the
    batch>1 note on :func:`ssim_loss`).
    """
    if pred.shape != target.shape or pred.ndim != 4:
        raise ValueError(f"expected matching (b,t,h,w), got {pred.shape} vs {target.shape}")
    b, t, h, w = pred.shape
    x = pred.reshape(b * t, h, w)
    y = target.reshape(b * t, h, w)

    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1)

    ux = _window_mean(x, win_size)
    uy = _window_mean(y, win_size)
    uxx = _window_mean(x * x, win_size)
    uyy = _window_mean(y * y, win_size)
    uxy = _window_mean(x * y, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    data_range = jnp.max(target, axis=(2, 3))  # (b, t)
    c1 = ((k1 * data_range) ** 2).reshape(b * t, 1, 1)
    c2 = ((k2 * data_range) ** 2).reshape(b * t, 1, 1)
    hw = ux.shape[-2:]

    a1 = 2 * ux * uy + c1
    a2 = 2 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    return jnp.mean(s.reshape(b, t, *hw), axis=(2, 3))  # (b, t)


def ssim_index_per_frame(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM per frame (averaged over the batch), shape (t,)."""
    return jnp.mean(ssim_index_per_sample(pred, target, win_size, k1, k2), axis=0)


def ssim_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
    sample_weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Time-averaged SSIM loss: mean over t of (1 - mean SSIM of frame t).

    ``sample_weight`` (shape ``(b,)``) weights each sample's contribution —
    padded samples in a trailing short batch carry weight 0, so the loss
    over a padded batch equals the loss over its real samples (the
    reference's DataLoader instead emits a smaller final batch; at the
    reference's batch size of 1 nothing is ever padded and the two match
    trivially). Batch>1 semantics are per-sample throughout: per-sample
    data_range (see :func:`ssim_index_per_sample`) and a weighted mean over
    samples, so a sample's loss never depends on what it is batched with.
    """
    s = ssim_index_per_sample(pred, target, win_size, k1, k2)  # (b, t)
    per_sample = jnp.mean(1.0 - s, axis=1)  # (b,)
    if sample_weight is None:
        return jnp.mean(per_sample)
    w = sample_weight.astype(per_sample.dtype)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)
