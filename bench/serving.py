"""Serving-artifact benchmark (VERDICT r2 #8).

Measures the deployment path end to end: export a weight-baked StableHLO
artifact (serve.export_model), then time artifact size, deserialize
(load) time, first-call latency, and steady-state throughput — against the
in-process jitted model. The reference has no serving story at all (its
.ckpt requires the full source tree, train_test_varnet.py:107-109).

Prints one JSON line. Usage: python bench/serving.py [--model varnet-XF]
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path


sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _protocol import (  # noqa: E402
    PROTOCOL_SHAPE,
    model_kwargs,
    protocol_inputs,
    rss_normalized_maps,
)


def main(model_name: str = "varnet-XF", packed: bool = True,
         normal_backend: str = ""):
    if normal_backend:
        from cinemri_tpu.physics.operators import set_normal_backend

        set_normal_backend(normal_backend)
    import jax

    from cinemri_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from cinemri_tpu.models import build_model
    from cinemri_tpu.serve import export_model, load_exported

    T = PROTOCOL_SHAPE[0]
    km, mask = protocol_inputs()

    family, dyn = model_name.split("-")
    kwargs = model_kwargs(family, dyn)
    if packed:
        kwargs["packed"] = True
    model = build_model(family, dyn, **kwargs)

    # CineNet takes externally-computed maps (cinenet.py:154-156); serve.py
    # exports the 5-arg (kre, kim, mask, sre, sim) signature for it. RSS-
    # normalized random maps — compute-identical to ESPIRiT output shapes.
    if family == "cinenet":
        sm = rss_normalized_maps()
        model_args = (km, mask, sm)
        served_args = (km.re, km.im, mask, sm.re, sm.im)
        export_kw = {"sens_maps": sm}
    else:
        model_args = (km, mask)
        served_args = (km.re, km.im, mask)
        export_kw = {}
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *model_args)

    # in-process reference timing
    fwd_sum = jax.jit(lambda p, *a: jnp.sum(model.apply(p, *a)))
    float(fwd_sum(params, *model_args))
    n = 20
    t0 = time.perf_counter()
    vals = [fwd_sum(params, *model_args) for _ in range(n)]
    float(vals[-1])
    inproc_s = (time.perf_counter() - t0) / n

    # export
    path = Path(tempfile.mkdtemp(prefix="serve_")) / "model.stablehlo"
    t0 = time.perf_counter()
    blob = export_model(model, params, km, mask, path=path, **export_kw)
    export_s = time.perf_counter() - t0

    # load + first call + steady state (fresh callable, cold program)
    t0 = time.perf_counter()
    fn = load_exported(path)
    load_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = fn(*served_args)
    out = jax.tree.leaves(out)[0]
    float(jnp.sum(out))
    first_call_s = time.perf_counter() - t0
    served_sum = jax.jit(lambda *a: jnp.sum(jax.tree.leaves(fn(*a))[0]))
    float(served_sum(*served_args))
    t0 = time.perf_counter()
    vals = [served_sum(*served_args) for _ in range(n)]
    float(vals[-1])
    served_s = (time.perf_counter() - t0) / n

    print(json.dumps({
        "model": model_name + ("-packed" if packed else ""),
        "artifact_mb": round(len(blob) / 1e6, 1),
        "export_s": round(export_s, 1),
        "load_s": round(load_s, 3),
        "first_call_s": round(first_call_s, 1),
        "inproc_fps": round(T / inproc_s, 1),
        "served_fps": round(T / served_s, 1),
        "served_vs_inproc": round(inproc_s / served_s, 3),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="varnet-XF")
    ap.add_argument("--no-packed", action="store_true")
    ap.add_argument("--normal_backend", default="", choices=("", "xla", "pallas"))
    a = ap.parse_args()
    main(a.model, packed=not a.no_packed, normal_backend=a.normal_backend)
