"""Training-step throughput at the reference protocol shape.

Times one full jitted train step (forward + backward through all remat'd
cascades + Adam update) per model family on the available accelerator —
the training-side counterpart of bench/all_models.py. The reference's only
training-time measurement is `perf_counter` hours around `trainer.fit`
(train_test_varnet.py:101-105).

Usage: python bench/train_step.py [--full] [--packed] [--bf16] [--only a,b]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _protocol import model_kwargs  # noqa: E402


def main(full: bool = False, packed: bool = False, bf16: bool = False,
         only: str = "", normal_backend: str = ""):
    import jax

    from cinemri_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    if normal_backend:
        from cinemri_tpu.physics.operators import set_normal_backend

        set_normal_backend(normal_backend)
    import jax.numpy as jnp
    import optax

    from cinemri_tpu.data.masks import RandomMask
    from cinemri_tpu.models import build_model
    from cinemri_tpu.ops.cplx import from_complex
    from cinemri_tpu.ops.ssim import ssim_loss
    from cinemri_tpu.train import make_optimizer

    T, C, H, W = 15, 10, 200, 200
    rng = np.random.default_rng(0)
    k = (
        rng.standard_normal((1, T, C, H, W))
        + 1j * rng.standard_normal((1, T, C, H, W))
    ).astype(np.complex64)
    mask_np = RandomMask([10], [4])(T, H, seed=0)[None]
    km = from_complex(k * mask_np)
    mask = jnp.asarray(mask_np.astype(np.float32))
    s = (
        rng.standard_normal((1, 1, C, H, W))
        + 1j * rng.standard_normal((1, 1, C, H, W))
    ).astype(np.complex64)
    s /= np.sqrt((np.abs(s) ** 2).sum(2, keepdims=True))
    sens = from_complex(s)
    target = jnp.asarray(np.abs(k).mean(axis=2).astype(np.float32))

    # reference-default kwargs live in bench/_protocol.py (single source)
    configs = [("varnet", "XF"), ("cinenet", "XF"), ("xpdnet", "XF")]
    if full:
        configs += [("varnet", "CRNN"), ("cinenet", "CRNN"), ("varnet", "3D"),
                    ("cinenet", "3D"), ("xpdnet", "CRNN")]

    wanted = {x.strip() for x in only.split(",") if x.strip()}
    tx = make_optimizer(lr=1e-4, lr_step_size=10**6, steps_per_epoch=1)
    for family, dyn in configs:
        kwargs = model_kwargs(family, dyn)
        name = f"{family}-{dyn}"
        if wanted and name not in wanted:
            continue
        if packed:
            kwargs = dict(kwargs, packed=True)
        if bf16:
            kwargs = dict(kwargs, bf16=True)
        suffix = ("-packed" if kwargs.get("packed") else "") + ("-bf16" if kwargs.get("bf16") else "")
        try:
            model = build_model(family, dyn, **kwargs)
            args = (km, mask, sens) if family == "cinenet" else (km, mask)
            params = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
            opt_state = tx.init(params)

            @jax.jit
            def step(params, opt_state, *a):
                def loss_fn(p):
                    return ssim_loss(model.apply(p, *a), target)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state2 = tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state2, loss

            t0 = time.perf_counter()
            params2, opt2, loss = step(params, opt_state, *args)
            float(loss)
            compile_s = time.perf_counter() - t0

            n = 10
            t0 = time.perf_counter()
            p, o = params2, opt2
            for _ in range(n):
                p, o, loss = step(p, o, *args)
            float(loss)  # sync: loss depends on the final step's params
            per_step = (time.perf_counter() - t0) / n
            print(json.dumps({
                "model": name + suffix,
                "step_ms": round(per_step * 1000, 1),
                "steps_per_sec": round(1 / per_step, 2),
                "compile_s": round(compile_s, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"model": name, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--packed", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--only", default="")
    ap.add_argument("--normal_backend", default="", choices=("", "xla", "pallas"))
    a = ap.parse_args()
    main(a.full, a.packed, a.bf16, a.only, a.normal_backend)
