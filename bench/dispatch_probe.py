"""Chip probe for the open dispatch question (rounds.md session 4).

BASELINE.md's serving table showed exported (weight-baked) programs running
up to 1.30x the in-process ``jit(model.apply)(params, ...)`` timing loop on
deep variants — evidence of a per-call cost that is NOT device compute:
pytree flatten of the parameter tree plus argument placement/donation checks
scale with leaf count, while a baked program takes 3 flat array args.

Three experiments, the first two at the headline mode (bf16 activations +
DFT matmuls at precision HIGH — bench.py protocol, VarNet-XF flagship
shapes), the third at shipping f32:

1. **serial_batch at headline mode**: the serving-modes table in BASELINE.md
   ("Serving modes") was measured on the round-2 f32 program. Re-measure
   batch=1 / joint batch=2,4 / ``serve.serial_batch`` 2,4 on the current
   program to confirm the VMEM-residency argument still holds under bf16.

2. **cascade sweep x param binding**: num_cascades in {5, 10, 20}; for each,
   time (a) ``jit(apply)(params, k, m)`` — params flattened every call — and
   (b) the same program with params closure-captured (baked constants, the
   serving path's binding). The (a)-(b) gap is pure host dispatch; if it
   grows with cascade count, the parameter-tree flatten is the culprit and
   deep in-process loops should prefer the baked binding.

3. **binding A/B** (``--experiment binding`` or part of ``all``): arg-bound
   vs baked vs exported-artifact timings for one variant (``--model``,
   ``--packed``) — the experiment behind BASELINE.md's binding table.

Prints one JSON line per measurement. Usage:
    python bench/dispatch_probe.py [--experiment serial|sweep|binding|all]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _protocol import PROTOCOL_SHAPE, model_kwargs, protocol_inputs, rss_normalized_maps  # noqa: E402

T, C, H, W = PROTOCOL_SHAPE
N_TIMED = 20


def _flagship(num_cascades: int = 10):
    import jax

    from cinemri_tpu.models import build_model
    from cinemri_tpu.ops.fft import set_dft_precision

    set_dft_precision("high")
    model = build_model(
        "varnet", "XF", num_cascades=num_cascades, sens_chans=8, sens_pools=3,
        chans=16, pools=3, bf16=True,
    )
    km, mask = protocol_inputs()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), km, mask)
    return model, params


def _time(fn, *args) -> float:
    """Steady-state seconds/call: sync on a device scalar (bench.py recipe)."""
    float(fn(*args))  # warm
    t0 = time.perf_counter()
    vals = [fn(*args) for _ in range(N_TIMED)]
    float(vals[-1])
    return (time.perf_counter() - t0) / N_TIMED


def serial_experiment():
    import jax
    import jax.numpy as jnp

    from cinemri_tpu.serve import serial_batch

    model, params = _flagship()

    def fwd(kk, mm):
        return model.apply(params, kk, mm)

    rows = []
    for batch in (1, 2, 4):
        km, mask = protocol_inputs(batch=batch)
        joint = jax.jit(lambda kk, mm: jnp.sum(fwd(kk, mm)))
        per_call = _time(joint, km, mask)
        rows.append(("joint", batch, per_call))
        if batch > 1:
            ser = jax.jit(lambda kk, mm: jnp.sum(serial_batch(fwd)(kk, mm)))
            per_call = _time(ser, km, mask)
            rows.append(("serial", batch, per_call))
    for mode, batch, sec in rows:
        print(json.dumps({
            "experiment": "serial_batch_bf16_dft_high",
            "mode": mode, "batch": batch,
            "ms_per_call": round(sec * 1e3, 2),
            "frames_per_sec": round(batch * T / sec, 1),
        }))


def sweep_experiment():
    import jax
    import jax.numpy as jnp

    km, mask = protocol_inputs()
    for nc in (5, 10, 20):
        model, params = _flagship(nc)
        n_leaves = len(jax.tree.leaves(params))

        arg_bound = jax.jit(
            lambda p, kk, mm: jnp.sum(model.apply(p, kk, mm)))
        sec_arg = _time(arg_bound, params, km, mask)

        baked = jax.jit(lambda kk, mm: jnp.sum(model.apply(params, kk, mm)))
        sec_baked = _time(baked, km, mask)

        print(json.dumps({
            "experiment": "cascade_sweep_bf16_dft_high",
            "num_cascades": nc, "param_leaves": n_leaves,
            "ms_arg_bound": round(sec_arg * 1e3, 2),
            "ms_baked": round(sec_baked * 1e3, 2),
            "dispatch_gap_ms": round((sec_arg - sec_baked) * 1e3, 2),
            "fps_arg_bound": round(T / sec_arg, 1),
            "fps_baked": round(T / sec_baked, 1),
        }))


def binding_experiment(model_name: str, packed: bool):
    """Arg-bound vs baked vs exported-artifact bindings for ONE variant, at
    its shipping precision (f32 — the serving table's condition). Isolates
    whether a served>in-process gap (BASELINE.md serving coverage,
    varnet-3D-packed 1.30x) is per-call dispatch or the artifact's program."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from cinemri_tpu.models import build_model
    from cinemri_tpu.serve import export_model, load_exported

    family, dyn = model_name.split("-")
    kwargs = model_kwargs(family, dyn)
    if packed:
        kwargs["packed"] = True
    model = build_model(family, dyn, **kwargs)
    km, mask = protocol_inputs()
    args = (km, mask)
    if family == "cinenet":  # external-maps signature
        args = (km, mask, rss_normalized_maps())
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
    n_leaves = len(jax.tree.leaves(params))

    arg_bound = jax.jit(lambda p, *a: jnp.sum(model.apply(p, *a)))
    sec_arg = _time(arg_bound, params, *args)

    baked = jax.jit(lambda *a: jnp.sum(model.apply(params, *a)))
    sec_baked = _time(baked, *args)

    with tempfile.TemporaryDirectory() as td:
        blob_path = Path(td) / "artifact.bin"
        export_model(
            model, params, args[0], args[1], path=blob_path,
            sens_maps=args[2] if len(args) > 2 else None,
        )
        served = load_exported(blob_path)
        flat = [x for a in args for x in ((a.re, a.im) if hasattr(a, "re") else (a,))]
        served_sum = jax.jit(lambda *fa: jnp.sum(served(*fa)))
        sec_served = _time(served_sum, *flat)

    print(json.dumps({
        "experiment": "binding_ab", "model": model_name, "packed": packed,
        "param_leaves": n_leaves,
        "ms_arg_bound": round(sec_arg * 1e3, 2),
        "ms_baked": round(sec_baked * 1e3, 2),
        "ms_served": round(sec_served * 1e3, 2),
        "fps_arg_bound": round(T / sec_arg, 1),
        "fps_baked": round(T / sec_baked, 1),
        "fps_served": round(T / sec_served, 1),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--experiment", default="all",
                    choices=["serial", "sweep", "binding", "all"])
    ap.add_argument("--model", default="varnet-3D",
                    help="binding experiment variant (family-dynamic)")
    ap.add_argument("--packed", action="store_true",
                    help="use the packed variant for the binding experiment "
                         "(opt-in, matching all_models.py; BASELINE.md's "
                         "binding table rows were measured --packed)")
    args = ap.parse_args()

    from cinemri_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    if args.experiment in ("serial", "all"):
        serial_experiment()
    if args.experiment in ("sweep", "all"):
        sweep_experiment()
    if args.experiment in ("binding", "all"):
        binding_experiment(args.model, args.packed)


if __name__ == "__main__":
    main()
