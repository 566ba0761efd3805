"""Input-pipeline throughput: cold (ESPIRiT calibration) vs warm (cached).

The reference's dominant data-path cost is BART `ecalib` inside every
`SliceDataset.__getitem__`, every epoch (SURVEY §3.4 — an O(seconds)
native call per sample per epoch, never cached). This framework computes
maps once per volume and caches (kspace, maps, target) as `.npz`
(`data/dataset.py`), so only the FIRST pass pays calibration. This bench
measures both passes through the real Loader on OCMR-layout HDF5 volumes.

Prints one JSON line. Usage: python bench/data_pipeline.py
"""

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from cinemri_tpu.data import (
        CineNetDataTransform,
        RandomMask,
        SliceDataset,
        VarNetDataTransform,
    )
    from cinemri_tpu.data.synthetic import make_synthetic_dataset
    from cinemri_tpu.train import Loader

    root = Path(tempfile.mkdtemp(prefix="pipe_"))
    n_vol, t, c, h, w = 4, 15, 10, 200, 200
    make_synthetic_dataset(
        root, splits=("train",), volumes_per_split=n_vol,
        num_frames=t, num_coils=c, h=h, w=w, noise=2e-3,
    )

    datasets = {}

    def run_epoch(epoch, transform, num_workers=1):
        # one dataset per transform, reused across epochs — exactly what
        # the Trainer does, so the in-process RAM volume cache counts
        key = id(transform)
        if key not in datasets:
            datasets[key] = SliceDataset(
                root / "train", transform=transform, maps_cache_dir=root / "maps",
            )
        loader = Loader(
            datasets[key], batch_size=1, shuffle=False, num_workers=num_workers
        )
        t0 = time.perf_counter()
        n = 0
        for batch in loader.epoch(epoch):
            n += batch["target"].shape[0]
        return time.perf_counter() - t0, n

    var_tr = VarNetDataTransform(RandomMask([10], [4]), use_seed=False)
    cold_s, n = run_epoch(0, var_tr)   # pays ESPIRiT calibration per volume
    warm_s, _ = run_epoch(1, var_tr)   # .npz cache hits
    warm4_s, _ = run_epoch(2, var_tr, num_workers=4)

    # CineNet path: per-sample r=15 ESPIRiT on the masked k-space
    # (the reference's transforms.py:425-432 cost) — measured warm-volume
    # with maps recomputed per epoch (reference semantics) and with the
    # per-(volume,slice) maps cache on
    cin_tr = CineNetDataTransform(RandomMask([10], [4]), use_seed=False)
    cin_warm_s, _ = run_epoch(1, cin_tr)
    cin_tr_cached = CineNetDataTransform(
        RandomMask([10], [4]), use_seed=False, cache_maps=True,
        maps_cache_dir=root / "maps",
    )
    run_epoch(0, cin_tr_cached)  # populate the maps cache
    cin_cached_s, _ = run_epoch(1, cin_tr_cached)
    cin_cached4_s, _ = run_epoch(2, cin_tr_cached, num_workers=4)

    print(
        json.dumps(
            {
                "volumes": n,
                "shape": f"{t}x{c}x{h}x{w}",
                "cold_s_per_volume": round(cold_s / n, 2),
                "warm_s_per_volume": round(warm_s / n, 3),
                "warm_s_per_volume_4workers": round(warm4_s / n, 3),
                "speedup_warm_vs_cold": round(cold_s / warm_s, 1),
                "cinenet_warm_s_per_volume": round(cin_warm_s / n, 3),
                "cinenet_cached_s_per_volume": round(cin_cached_s / n, 3),
                "cinenet_cached_s_per_volume_4workers": round(cin_cached4_s / n, 3),
                "note": (
                    "reference pays the cold path (BART ecalib in "
                    "__getitem__) EVERY epoch; this pipeline only on the "
                    "first pass per volume. cinenet_warm recomputes the "
                    "r=15 per-sample maps each epoch (reference "
                    "semantics); cinenet_cached uses --cache_sens_maps"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
