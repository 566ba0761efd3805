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
    from cinemri_tpu.data import RandomMask, SliceDataset, VarNetDataTransform
    from cinemri_tpu.data.synthetic import make_synthetic_dataset
    from cinemri_tpu.train import Loader

    root = Path(tempfile.mkdtemp(prefix="pipe_"))
    n_vol, t, c, h, w = 4, 15, 10, 200, 200
    make_synthetic_dataset(
        root, splits=("train",), volumes_per_split=n_vol,
        num_frames=t, num_coils=c, h=h, w=w, noise=2e-3,
    )

    def run_epoch(epoch):
        ds = SliceDataset(
            root / "train",
            transform=VarNetDataTransform(RandomMask([10], [4]), use_seed=False),
            maps_cache_dir=root / "maps",
        )
        loader = Loader(ds, batch_size=1, shuffle=False)
        t0 = time.perf_counter()
        n = 0
        for batch in loader.epoch(epoch):
            n += batch["target"].shape[0]
        return time.perf_counter() - t0, n

    cold_s, n = run_epoch(0)   # pays ESPIRiT calibration per volume
    warm_s, _ = run_epoch(1)   # .npz cache hits

    print(
        json.dumps(
            {
                "volumes": n,
                "shape": f"{t}x{c}x{h}x{w}",
                "cold_s_per_volume": round(cold_s / n, 2),
                "warm_s_per_volume": round(warm_s / n, 3),
                "speedup_warm_vs_cold": round(cold_s / warm_s, 1),
                "note": (
                    "reference pays the cold path (BART ecalib in "
                    "__getitem__) EVERY epoch; this pipeline only on the "
                    "first pass per volume"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
