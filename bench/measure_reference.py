"""Measure the reference PyTorch VarNet-XF CPU forward (baseline for bench.py).

Runs the reference code at /root/reference (read-only) with its default
flagship config on synthetic inputs; the BART import is stubbed because the
forward path never calls it. Result is recorded in BASELINE.md and baked
into bench.py as REFERENCE_CPU_FRAMES_PER_SEC.
"""

import sys
import time
import types

import numpy as np
import torch

REFERENCE = "/root/reference"
T, C, H, W = 15, 10, 200, 200


def main():
    bart_stub = types.ModuleType("bart")
    bart_stub.bart = lambda *a, **k: None
    sys.modules["bart"] = bart_stub
    sys.path.insert(0, REFERENCE)
    import reconstruction.utils  # noqa: F401  (registers rec.utils attribute)
    from reconstruction.models.varnet import VarNet

    torch.manual_seed(0)
    k = torch.randn(1, T, C, H, W, 2)
    m = torch.zeros(1, T, 1, H, 1, 1)
    m[:, :, :, H // 2 - 5 : H // 2 + 5] = 1
    idx = np.random.default_rng(0).choice(H, H // 4, replace=False)
    m[:, :, :, idx] = 1
    m[:, :, :, 3] = 0
    m[:, :, :, H - 4] = 0  # zeros must flank the center band (varnet.py:63-68)

    model = VarNet(
        num_cascades=10, sens_chans=8, sens_pools=3, chans=16, pools=3,
        dynamic_type="XF",
    ).eval()
    with torch.no_grad():
        model(k, m.byte())  # warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            model(k, m.byte())
            times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"reference VarNet-XF CPU forward: {best:.3f}s/volume = {T/best:.3f} frames/sec")


if __name__ == "__main__":
    main()
