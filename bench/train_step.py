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
         only: str = "", normal_backend: str = "", remat_policy: str = "",
         no_remat: bool = False, no_prevent_cse: bool = False,
         donate: bool = False, batch: int = 1):
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
    B = batch
    rng = np.random.default_rng(0)
    k = (
        rng.standard_normal((B, T, C, H, W))
        + 1j * rng.standard_normal((B, T, C, H, W))
    ).astype(np.complex64)
    mask_np = np.stack(
        [RandomMask([10], [4])(T, H, seed=i) for i in range(B)]
    )
    km = from_complex(k * mask_np)
    mask = jnp.asarray(mask_np.astype(np.float32))
    s = (
        rng.standard_normal((B, 1, C, H, W))
        + 1j * rng.standard_normal((B, 1, C, H, W))
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
        if remat_policy:
            kwargs = dict(kwargs, remat_policy=remat_policy)
        if no_remat:
            kwargs = dict(kwargs, remat=False)
        if no_prevent_cse:
            kwargs = dict(kwargs, remat_prevent_cse=False)
        suffix = (
            ("-packed" if kwargs.get("packed") else "")
            + ("-bf16" if kwargs.get("bf16") else "")
            + (f"-remat_{remat_policy}" if remat_policy else "")
            + ("-no_remat" if no_remat else "")
            + ("-no_cse_barrier" if no_prevent_cse else "")
            + ("-donate" if donate else "")
            + (f"-b{batch}" if batch != 1 else "")
        )
        try:
            model = build_model(family, dyn, **kwargs)
            args = (km, mask, sens) if family == "cinenet" else (km, mask)
            params = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
            opt_state = tx.init(params)

            def step_fn(params, opt_state, *a):
                def loss_fn(p):
                    return ssim_loss(model.apply(p, *a), target)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state2 = tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state2, loss

            # --donate matches the real trainer (train/step.py jits with
            # donate_argnums=(0,)): params/opt_state buffers are reused
            # in place, which also lets XLA keep their layouts stable
            step = jax.jit(
                step_fn, donate_argnums=(0, 1) if donate else ()
            )

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
    ap.add_argument("--remat_policy", default="",
                    choices=("", "dots", "dots_batch", "convs"),
                    help="cascade-remat checkpoint policy (models.remat)")
    ap.add_argument("--no_remat", action="store_true",
                    help="disable cascade remat entirely (save everything)")
    ap.add_argument("--no_prevent_cse", action="store_true",
                    help="drop the remat CSE barriers (safe under jit-of-scan)")
    ap.add_argument("--donate", action="store_true",
                    help="donate params/opt_state like the real trainer")
    ap.add_argument("--batch", type=int, default=1,
                    help="global batch size (volumes per step)")
    a = ap.parse_args()
    main(a.full, a.packed, a.bf16, a.only, a.normal_backend, a.remat_policy,
         a.no_remat, a.no_prevent_cse, a.donate, a.batch)
