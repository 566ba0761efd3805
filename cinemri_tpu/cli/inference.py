"""Timed inference runner producing the reference's .npy artifact set.

Parity target: reference traintest_scripts/run_inference.py:13-82 — for each
inference volume: a timed model forward (the reference's only latency
benchmark), a zero-filled RSS baseline reconstruction, center-crop
alignment, and ``target_*.npy`` / ``output_{model}_*.npy`` /
``zero_filled_*.npy`` dumps consumed by the visualization notebook.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict

import jax
import numpy as np

from cinemri_tpu.data.transforms import center_crop_to_smallest
from cinemri_tpu.ops.cplx import from_complex

__all__ = ["InferenceRunner", "zero_filled_recon", "reconstruct_long_clip"]


def reconstruct_long_clip(
    forward,
    masked_kspace: np.ndarray,
    mask: np.ndarray,
    chunk_frames: int = 15,
) -> np.ndarray:
    """Reconstruct a clip longer than the trained temporal extent.

    The reference handles long cine clips offline by splitting them into
    15-frame chunks and concatenating the reconstructions
    (reconstruction_visualisation.ipynb cell 0 text / cell 2). Same recipe:
    ``forward(masked_kspace_chunk, mask_chunk) -> (b, tc, h, w)`` is called
    per chunk (a trailing short chunk is left-extended to keep the jitted
    shape static) and outputs are stitched along t.

    Args:
        forward: callable over numpy complex k-space (b, t, c, h, w) and
            mask (b, t|1, 1, h, 1); e.g. a jitted, weight-bound model.
    """
    t = masked_kspace.shape[1]
    if t <= chunk_frames:
        return np.asarray(forward(masked_kspace, mask))
    outs = []
    static_mask = mask.shape[1] == 1
    for start in range(0, t, chunk_frames):
        end = min(start + chunk_frames, t)
        lo = end - chunk_frames  # left-extend the final short chunk
        k_chunk = masked_kspace[:, lo:end]
        m_chunk = mask if static_mask else mask[:, lo:end]
        out = np.asarray(forward(k_chunk, m_chunk))
        outs.append(out[:, start - lo :])
    return np.concatenate(outs, axis=1)


def zero_filled_recon(masked_kspace: np.ndarray) -> np.ndarray:
    """Zero-filled RSS baseline (run_inference.py:64-67): unnormalized IFFT
    rescaled by sqrt(h*w), then RSS over coils. Host-side numpy (this is a
    save-path artifact, not a compute-path op)."""
    h, w = masked_kspace.shape[-2:]
    images = np.fft.fftshift(
        np.fft.ifft2(np.fft.ifftshift(masked_kspace, axes=(-2, -1))), axes=(-2, -1)
    ) * np.sqrt(h * w)
    return np.sqrt((np.abs(images) ** 2).sum(axis=2))


class InferenceRunner:
    """Runs a trained model over the inference split and saves artifacts.

    Weights are FIXED at construction: the jitted forward closure-captures
    ``params`` (see the baked-binding note below), so assigning a new tree
    to the runner after construction has no effect — build a new runner to
    swap checkpoints.
    """

    def __init__(self, model, params, model_type: str, save_path: Path):
        assert model_type in ("varnet", "cinenet", "xpdnet"), "Wrong model_type arg."
        self.model_type = model_type
        self.save_path = Path(save_path)
        self.save_path.mkdir(parents=True, exist_ok=True)
        self._params = params
        # Weights are fixed for the runner's lifetime, so bake them into the
        # compiled program (closure capture) instead of passing the tree as
        # an argument: constant weights let XLA assign them their preferred
        # conv layouts at compile time, where argument weights arrive in the
        # default layout and the program pays a per-call on-device layout
        # conversion. Measured on the chip (bench/dispatch_probe.py
        # --experiment binding): varnet-3D-packed 73.5 -> 56.3 ms/volume
        # (1.31x); this is exactly the serving artifact's timing, closing
        # the served>in-process gap in BASELINE.md's serving table.
        self._forward = jax.jit(lambda *args: model.apply(params, *args))

    def __call__(self, batch: Dict) -> float:
        """Returns the forward wall-clock seconds (device-synchronized)."""
        import jax.numpy as jnp

        args = [from_complex(batch["masked_kspace"]), jnp.asarray(batch["mask"])]
        if self.model_type == "cinenet":
            args.append(from_complex(batch["sens_maps"]))

        t0 = time.perf_counter()
        output = self._forward(*args)
        output.block_until_ready()
        elapsed = time.perf_counter() - t0

        target = np.asarray(batch["target"], np.float32)
        output = np.asarray(output, np.float32)
        zero_filled = np.asarray(
            zero_filled_recon(np.asarray(batch["masked_kspace"])), np.float32
        )

        target, output = center_crop_to_smallest(target, output)
        target, zero_filled = center_crop_to_smallest(target, zero_filled)

        fname = batch["fname"][0]
        np.save(self.save_path / f"target_{fname}.npy", target[0])
        np.save(self.save_path / f"output_{self.model_type}_{fname}.npy", output[0])
        np.save(self.save_path / f"zero_filled_{fname}.npy", zero_filled[0])
        return elapsed
