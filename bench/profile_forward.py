"""Op-level profile of one model's forward (or train step) on the chip.

Packages the round-3 analysis method (instrument.trace -> opstats op
aggregation) as a script: where does the wall-clock of a named variant go,
and how does it compare to the HBM speed-of-light for the program's
memory traffic (compiled cost_analysis bytes / chip HBM bandwidth). This
is the harness behind the perf-tail write-ups in BASELINE.md ("Perf-tail
profiles"); the reference has no profiler at all (SURVEY §5).

Prints one JSON line. Usage:
  python bench/profile_forward.py --model cinenet-CRNN [--packed] [--train]
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# chip HBM bandwidth for the speed-of-light bound, bytes/sec
_HBM_BW = {"v5 lite": 819e9, "v5e": 819e9, "v5p": 2765e9, "v4": 1228e9,
           "v6": 1640e9, "trillium": 1640e9}

from _protocol import model_kwargs, protocol_inputs, rss_normalized_maps


def main(model_name: str, packed: bool = False, bf16: bool = False,
         train: bool = False, runs: int = 20, top_n: int = 12,
         shape: tuple = (15, 10, 200, 200)):
    import jax

    from cinemri_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from cinemri_tpu.instrument import trace
    from cinemri_tpu.instrument.opstats import fold_by_kind, op_durations, sort_top
    from cinemri_tpu.models import build_model

    T = shape[0]
    km, mask = protocol_inputs(shape)

    family, dyn = model_name.split("-")
    kwargs = model_kwargs(family, dyn)
    if packed:
        kwargs["packed"] = True
    if bf16:
        kwargs["bf16"] = True
    model = build_model(family, dyn, **kwargs)

    if family == "cinenet":  # external maps (cinenet.py:154-156)
        args = (km, mask, rss_normalized_maps(shape))
    else:
        args = (km, mask)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *args)

    if train:
        import optax

        from cinemri_tpu.ops.ssim import ssim_loss

        tgt = jnp.asarray(
            np.random.default_rng(1).random((1, T, shape[2], shape[3])),
            jnp.float32,
        )
        opt = optax.adam(1e-4)
        opt_state = opt.init(params)

        def step(p, s, *a):
            def loss_fn(pp):
                return ssim_loss(model.apply(pp, *a), tgt)

            loss, g = jax.value_and_grad(loss_fn)(p)
            updates, s = opt.update(g, s, p)
            return optax.apply_updates(p, updates), s, loss

        jitted = jax.jit(step)

        # time by queueing and syncing on the on-device loss scalar:
        # block_until_ready is unreliable on remote-dispatch TPU backends
        # (same recipe as bench.py). The state carry is THREADED through
        # the loop like real training: timing N independent executions of
        # the same (params, opt_state) keeps all N output state trees live
        # at once, which on the packed 3-D variants pushes HBM into a
        # spill regime and measured 22x slower than the shipping
        # bench/train_step.py harness (BASELINE.md round-5 harness note).
        carry = {"p": params, "s": opt_state}

        def run():
            p2, s2, loss = jitted(carry["p"], carry["s"], *args)
            carry["p"], carry["s"] = p2, s2
            return loss

        lowered = jitted.lower(params, opt_state, *args)
    else:
        jit_sum = jax.jit(lambda p, *a: jnp.sum(model.apply(p, *a)))
        run = lambda: jit_sum(params, *args)
        lowered = jax.jit(model.apply).lower(params, *args)

    float(run())  # compile + warmup
    float(run())
    t0 = time.perf_counter()
    vals = [run() for _ in range(runs)]
    float(vals[-1])  # one sync: all queued executions are done
    wall_ms = (time.perf_counter() - t0) / runs * 1e3

    tdir = Path(tempfile.mkdtemp(prefix="profile_"))
    with trace(tdir):
        vals = [run() for _ in range(runs)]
        float(vals[-1])

    cost = lowered.compile().cost_analysis()
    bytes_accessed = float(cost.get("bytes accessed", 0.0))
    flops = float(cost.get("flops", 0.0))
    kind = jax.devices()[0].device_kind.lower()
    bw = next((v for key, v in _HBM_BW.items() if key in kind), None)
    sol_ms = bytes_accessed / bw * 1e3 if bw and bytes_accessed else None

    durs = op_durations(tdir, runs=runs)  # parse the xplane protos once
    kinds = fold_by_kind(durs)
    ops = sort_top(durs, top_n)
    # attributed_ms is a LOWER BOUND on device time: the xplane trace can
    # miss op kinds (e.g. custom-call matmuls report 0) and drop events
    # under buffer pressure. coverage = attributed/wall says how much of
    # the program the per-kind table explains; treat by_kind_ms as
    # indicative, and wall_ms (queued, scalar-synced) as ground truth.
    attributed_ms = sum(kinds.values())
    coverage = attributed_ms / wall_ms if wall_ms else None  # 0.0 is meaningful
    print(json.dumps({
        "model": model_name + ("-packed" if packed else "") + ("-bf16" if bf16 else ""),
        "mode": "train_step" if train else "forward",
        "wall_ms": round(wall_ms, 2),
        "attributed_ms": round(attributed_ms, 2),
        "attribution_coverage": (round(coverage, 3) if coverage is not None
                                 else None),
        "fps": round(T / (wall_ms / 1e3), 1),
        "bytes_accessed_mb": round(bytes_accessed / 1e6, 1),
        "flops_g": round(flops / 1e9, 2),
        "hbm_speed_of_light_ms": round(sol_ms, 2) if sol_ms else None,
        "sol_fraction_of_wall": round(sol_ms / wall_ms, 3) if sol_ms and wall_ms else None,
        "note": (None if coverage is None or coverage >= 0.85 else
                 "trace attribution covers <85% of wall; per-kind numbers "
                 "are lower bounds"),
        "by_kind_ms": {k_: round(v, 3) for k_, v in
                       sorted(kinds.items(), key=lambda kv: -kv[1])},
        "top_ops_ms": [(n_, round(ms, 3)) for n_, ms in ops],
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="cinenet-CRNN")
    ap.add_argument("--packed", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--runs", default=20, type=int)
    ap.add_argument("--top_n", default=12, type=int)
    ap.add_argument("--shape", nargs=4, type=int, default=(15, 10, 200, 200),
                    metavar=("T", "C", "H", "W"),
                    help="volume shape; default = protocol scale")
    a = ap.parse_args()
    main(a.model, a.packed, a.bf16, a.train, a.runs, a.top_n, tuple(a.shape))
