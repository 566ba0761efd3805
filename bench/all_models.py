"""Benchmark every model family (and optionally every dynamic variant) on
the available accelerator at the reference's flagship configs.

Prints one JSON line per config: volume latency + frames/sec.
Usage: python bench/all_models.py [--full] [--packed] [--only varnet-3D,...]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _protocol import model_kwargs  # noqa: E402


_HBM_BW = {"v5 lite": 819e9, "v5e": 819e9, "v5p": 2765e9, "v4": 1228e9,
           "v6": 1640e9, "trillium": 1640e9}  # bytes/sec, vendor specs


def _utilization(jitted, args, seconds: float):
    """Compiled-program utilization vs the chip's two rooflines.

    Returns ``(mfu, hbm_gbps, hbm_frac)``: FLOPs/wall vs bf16 peak, and
    achieved HBM traffic (cost_analysis 'bytes accessed' / wall) as GB/s
    and as a fraction of peak HBM bandwidth. hbm_frac is THE roofline that
    binds these models (BASELINE.md: 16-channel widths are bandwidth-bound
    even after packing) — MFU alone undersells where the wall is.
    """
    import jax

    peaks = {"v5 lite": 197e12, "v5e": 197e12, "v5p": 459e12, "v4": 275e12,
             "v6": 918e12, "trillium": 918e12}
    kind = jax.devices()[0].device_kind.lower()
    peak = next((v for k, v in peaks.items() if k in kind), None)
    bw = next((v for k, v in _HBM_BW.items() if k in kind), None)
    if peak is None:
        return None, None, None
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        flops = float(cost.get("flops", 0.0))
        bytes_accessed = float(cost.get("bytes accessed", 0.0))
    except Exception:
        return None, None, None
    mfu = round(flops / seconds / peak, 4) if flops > 0 else None
    gbps = bytes_accessed / seconds / 1e9 if bytes_accessed > 0 else None
    frac = (round(gbps * 1e9 / bw, 3) if gbps is not None and bw else None)
    return mfu, (round(gbps, 1) if gbps is not None else None), frac


def main(full: bool = False, packed: bool = False, only: str = "",
         bf16: bool = False, normal_backend: str = "", compress_coils: int = 0):
    import jax

    from cinemri_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    if normal_backend:
        from cinemri_tpu.physics.operators import set_normal_backend

        set_normal_backend(normal_backend)
    import jax.numpy as jnp

    from cinemri_tpu.data.masks import RandomMask
    from cinemri_tpu.models import build_model
    from cinemri_tpu.ops.cplx import from_complex

    T, C, H, W = 15, 10, 200, 200
    rng = np.random.default_rng(0)
    k = (rng.standard_normal((1, T, C, H, W)) + 1j * rng.standard_normal((1, T, C, H, W))).astype(np.complex64)
    mask_np = RandomMask([10], [4])(T, H, seed=0)[None]
    km_np = (k * mask_np)[0]
    if compress_coils:
        from cinemri_tpu.data.compress import apply_compression, compression_matrix

        cmat = compression_matrix(km_np, compress_coils, mask_np[0])
        km_np = apply_compression(km_np, cmat)
        C = compress_coils
    km = from_complex(km_np[None])
    mask = jnp.asarray(mask_np.astype(np.float32))
    sens_np = (rng.standard_normal((1, 1, C, H, W)) + 1j * rng.standard_normal((1, 1, C, H, W))).astype(np.complex64)
    sens_np /= np.sqrt((np.abs(sens_np) ** 2).sum(2, keepdims=True))
    sens = from_complex(sens_np)

    # reference-default kwargs live in bench/_protocol.py (single source)
    configs = [("varnet", "XF"), ("cinenet", "XF"), ("xpdnet", "XF"),
               ("varnet", "CRNN")]
    if full or only:
        configs += [("varnet", "2D"), ("varnet", "3D"), ("varnet", "XT"),
                    ("cinenet", "CRNN"), ("xpdnet", "CRNN"),
                    ("cinenet", "2D"), ("cinenet", "3D"), ("xpdnet", "2D"),
                    ("cinenet", "XT"), ("xpdnet", "XT")]

    wanted = {s.strip() for s in only.split(",") if s.strip()}
    for family, dyn in configs:
        kwargs = model_kwargs(family, dyn)
        name = f"{family}-{dyn}"
        if wanted and name not in wanted:
            continue
        if packed:
            kwargs = dict(kwargs, packed=True)
        if bf16:
            kwargs = dict(kwargs, bf16=True)
        try:
            model = build_model(family, dyn, **kwargs)
            args = (km, mask, sens) if family == "cinenet" else (km, mask)
            t0 = time.perf_counter()
            params = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
            # Baked binding (weights closure-captured): the shipping
            # inference path (cli/inference.py) and the serving artifact
            # both bind this way, and constant weights get their preferred
            # conv layouts at compile time — measured up to 1.31x over the
            # arg-bound program on packed 3-D variants
            # (bench/dispatch_probe.py --experiment binding).
            fwd_sum = jax.jit(lambda *a: jnp.sum(model.apply(params, *a)))
            # One-time finiteness check through a throwaway program, freed
            # before the timing loop so only ONE weight-embedded executable
            # stays live (advisor r4: two baked programs double the
            # executable-embedded weight memory).
            chk = jax.jit(lambda *a: jnp.all(jnp.isfinite(model.apply(params, *a))))
            out_finite = bool(chk(*args))
            del chk
            float(fwd_sum(*args))
            compile_s = time.perf_counter() - t0
            assert out_finite
            n = 20
            t0 = time.perf_counter()
            vals = [fwd_sum(*args) for _ in range(n)]
            float(vals[-1])  # sync on the final scalar
            best = (time.perf_counter() - t0) / n
            mfu, hbm_gbps, hbm_frac = _utilization(fwd_sum, args, best)
            print(json.dumps({
                "model": name + ("-packed" if kwargs.get("packed") else "")
                + ("-bf16" if kwargs.get("bf16") else "")
                + ("-npallas" if normal_backend == "pallas" else "")
                + (f"-cc{compress_coils}" if compress_coils else ""),
                "volume_ms": round(best * 1000, 2),
                "frames_per_sec": round(T / best, 1),
                "compile_s": round(compile_s, 1),
                "mfu": mfu,
                "hbm_gbps": hbm_gbps,
                "hbm_frac": hbm_frac,
            }), flush=True)
        except Exception as e:  # keep the sweep going
            print(json.dumps({"model": name, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--packed", action="store_true",
                    help="space-to-depth denoisers for varnet/cinenet")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 denoiser activations (all families; xpdnet's is "
                         "outside the certified-quality envelope, BASELINE.md)")
    ap.add_argument("--only", default="", help="comma-separated model-dyn list")
    ap.add_argument("--normal_backend", default="", choices=("", "xla", "pallas"),
                    help="normal-operator apply backend (ops/kernels/"
                         "normal_pallas.py fused kernel vs the XLA einsums)")
    ap.add_argument("--compress_coils", type=int, default=0,
                    help="run the protocol volume through SVD coil "
                         "compression to N virtual coils (data/compress.py)")
    a = ap.parse_args()
    main(a.full, a.packed, a.only, a.bf16, a.normal_backend, a.compress_coils)
