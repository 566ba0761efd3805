"""Benchmark: cine reconstruction throughput (frames/sec) on the flagship
VarNet-XF configuration, versus the reference running on CPU.

Protocol (matches the reference's only latency benchmark,
traintest_scripts/run_inference.py:53-61, at its default config):
  * VarNet-XF, 10 cascades, chans 16, pools 3, sens 8/3
    (train_test_varnet.py:249-262 defaults);
  * one volume of 15 frames x 10 coils x 200x200 k-space, random Cartesian
    mask @4x with 10 center lines;
  * timed jitted forward, device-synchronized, best of several runs.

Baseline: the reference PyTorch VarNet-XF forward on this machine's CPU
(torch 2.13+cpu, 1 core): 32.3 s/volume = 0.464 frames/sec, measured with
bench/measure_reference.py (recorded in BASELINE.md). The driver's north
star is >=10x that at matched SSIM.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

# measured by bench/measure_reference.py on this container (see BASELINE.md)
REFERENCE_CPU_FRAMES_PER_SEC = 0.464

T, C, H, W = 15, 10, 200, 200


def main():
    import jax
    import jax.numpy as jnp

    from cinemri_tpu.data.masks import RandomMask
    from cinemri_tpu.models import build_model
    from cinemri_tpu.ops.cplx import from_complex

    rng = np.random.default_rng(0)
    k = (
        rng.standard_normal((1, T, C, H, W)) + 1j * rng.standard_normal((1, T, C, H, W))
    ).astype(np.complex64)
    mask = RandomMask([10], [4])(T, H, seed=0)[None]
    masked_kspace = from_complex(k * mask)
    mask = jnp.asarray(mask.astype(np.float32))

    model = build_model(
        "varnet", "XF", num_cascades=10, sens_chans=8, sens_pools=3, chans=16, pools=3
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), masked_kspace, mask)
    fwd = jax.jit(lambda p, kk, mm: model.apply(p, kk, mm))

    # warmup / compile
    np.asarray(fwd(params, masked_kspace, mask))  # also validates the result transfers

    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        fwd(params, masked_kspace, mask).block_until_ready()
        runs.append(time.perf_counter() - t0)
    best = min(runs)
    fps = T / best

    print(
        json.dumps(
            {
                "metric": "varnet_xf_recon_frames_per_sec",
                "value": round(fps, 3),
                "unit": "frames/sec",
                "vs_baseline": round(fps / REFERENCE_CPU_FRAMES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
