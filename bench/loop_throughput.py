"""Trainer LOOP throughput (not just the jitted step): steps/sec of
Trainer.fit over a synthetic protocol-scale dataset, default logging vs
max-throughput mode (--compute_train_metrics 0 --log_every_steps 0, which
defers all loss syncs to one epoch-end drain so steps pipeline).

bench/train_step.py measures the pure jitted step; this script measures
what a user's wall clock actually sees — loader decode, shard_batch, the
per-step host syncs, and TB logging. Prints one JSON line per mode.

Usage: python bench/loop_throughput.py [--model varnet-XF] [--volumes 8]
       [--epochs 2] [--shape T C H W]
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _protocol import model_kwargs  # noqa: E402


def main(model_name: str = "varnet-XF", volumes: int = 8, epochs: int = 2,
         shape=(15, 10, 200, 200)):
    from cinemri_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from cinemri_tpu.data.dataset import SliceDataset
    from cinemri_tpu.data.masks import RandomMask
    from cinemri_tpu.data.synthetic import make_synthetic_dataset
    from cinemri_tpu.data.transforms import (
        CineNetDataTransform,
        VarNetDataTransform,
        XPDNetDataTransform,
    )
    from cinemri_tpu.models import build_model
    from cinemri_tpu.train.loop import Trainer, TrainerConfig

    family, dyn = model_name.split("-")
    T, C, H, W = shape
    root = Path(tempfile.mkdtemp(prefix="loopbench_"))
    make_synthetic_dataset(root / "data", splits=("train",),
                           volumes_per_split=volumes, num_frames=T,
                           num_coils=C, h=H, w=W)
    center, accel = ((10, 4) if H >= 64 else (4, 2))
    tf_cls = {"varnet": VarNetDataTransform, "cinenet": CineNetDataTransform,
              "xpdnet": XPDNetDataTransform}[family]
    mask_fn = RandomMask([center], [accel])

    def run(compute_metrics: bool, log_every: int, n_epochs: int) -> float:
        from cinemri_tpu.train.loader import Loader

        ds = SliceDataset(
            root / "data" / "train",
            transform=tf_cls(mask_fn, use_seed=True),
            maps_cache_dir=root / "maps",
        )
        model = build_model(family, dyn, **model_kwargs(family, dyn))
        cfg = TrainerConfig(
            epochs=n_epochs, lr=1e-4, ckpt_dir=None,
            log_dir=root / f"tb_{compute_metrics}_{log_every}_{n_epochs}",
            compute_train_metrics=compute_metrics, log_every_steps=log_every,
        )
        trainer = Trainer(model, cfg, train_loader=Loader(ds, batch_size=1))
        t0 = time.perf_counter()
        trainer.fit()
        return time.perf_counter() - t0

    assert epochs >= 2, "need >= 2 epochs to difference out the compile"
    for label, (cm, le) in {
        "reference-logging": (True, 1),
        "max-throughput": (False, 0),
    }.items():
        # difference a 1-epoch run out of an epochs-run: after a warmup fit
        # populates the persistent compile cache, both timed runs pay the
        # same (cached) compile, so the difference is pure loop cost
        run(cm, le, 1)  # warmup: compile + cache
        t1 = run(cm, le, 1)
        tn = run(cm, le, epochs)
        steady = (tn - t1) / (epochs - 1)
        print(json.dumps({
            "model": model_name,
            "mode": label,
            "volumes": volumes,
            "epochs": epochs,
            "steady_epoch_s": round(steady, 3),
            "steps_per_sec": round(volumes / steady, 3),
            "ms_per_step": round(steady / volumes * 1e3, 2),
        }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="varnet-XF")
    ap.add_argument("--volumes", default=8, type=int)
    ap.add_argument("--epochs", default=2, type=int)
    ap.add_argument("--shape", nargs=4, type=int, default=(15, 10, 200, 200),
                    metavar=("T", "C", "H", "W"))
    a = ap.parse_args()
    main(a.model, a.volumes, a.epochs, tuple(a.shape))
