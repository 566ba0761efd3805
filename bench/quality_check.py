"""End-to-end quality validation on the available accelerator.

Trains a reduced VarNet-XF on synthetic beating-phantom volumes and reports
test SSIM/NMSE/PSNR versus the zero-filled baseline — the full
data-to-metrics pipeline (ESPIRiT targets, masking, training, per-volume
aggregation) exercised on real hardware. Results are recorded in
BASELINE.md.

Usage: python bench/quality_check.py [--epochs 30]
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cinemri_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def main(epochs: int = 30, compress_coils: int = 0,
         num_coils: int = 6, coil_modes: int = 0,
         coil_mode_noise: float = 0.02):
    from cinemri_tpu.data import RandomMask, SliceDataset, VarNetDataTransform
    from cinemri_tpu.data.synthetic import make_synthetic_dataset
    from cinemri_tpu.models import build_model
    from cinemri_tpu.ops import metrics as M
    from cinemri_tpu.train import Loader, Trainer, TrainerConfig
    from cinemri_tpu.cli.inference import zero_filled_recon
    from cinemri_tpu.data.transforms import center_crop_to_smallest

    root = Path(tempfile.mkdtemp(prefix="quality_"))
    make_synthetic_dataset(
        root, splits=("train", "valid", "test"), volumes_per_split=4,
        num_frames=8, num_coils=num_coils, h=64, w=64, noise=2e-3,
        coil_modes=coil_modes, coil_mode_noise=coil_mode_noise,
    )

    def loader(split, shuffle):
        ds = SliceDataset(
            root / split,
            transform=VarNetDataTransform(RandomMask([8], [4]), use_seed=(split != "train"),
                                          compress_coils=compress_coils),
            maps_cache_dir=root / "maps",
        )
        return Loader(ds, batch_size=1, shuffle=shuffle)

    cfg = TrainerConfig(epochs=epochs, lr=1e-3, lr_step_size=10 * epochs,
                        compute_train_metrics=False)
    trainer = Trainer(
        build_model("varnet", "XF", num_cascades=6, sens_chans=6, sens_pools=2,
                    chans=12, pools=3),
        cfg,
        train_loader=loader("train", True),
        val_loader=None,
        test_loader=loader("test", False),
    )
    t0 = time.perf_counter()
    history = trainer.fit()
    train_s = time.perf_counter() - t0
    test = trainer.test()

    # zero-filled baseline through the same metric recipe
    zf_ssim, zf_nmse = [], []
    for batch in loader("test", False).epoch(0):
        zf = zero_filled_recon(np.asarray(batch["masked_kspace"]))
        tgt, zf = center_crop_to_smallest(batch["target"], zf)
        for i in range(tgt.shape[0]):
            zf_ssim.append(M.ssim(tgt[i], zf[i], maxval=float(batch["max_value"][i])))
            zf_nmse.append(M.nmse(tgt[i], zf[i]))

    print(json.dumps({
        "epochs": epochs,
        "num_coils": num_coils,
        "coil_modes": coil_modes,
        "coil_mode_noise": coil_mode_noise,
        "compress_coils": compress_coils,
        "train_minutes": round(train_s / 60, 1),
        "first_epoch_loss": round(history[0]["train_loss"], 4),
        "last_epoch_loss": round(history[-1]["train_loss"], 4),
        "test_ssim": round(test["ssim"], 4),
        "test_nmse": round(test["nmse"], 5),
        "test_psnr": round(test["psnr"], 2),
        "zero_filled_ssim": round(float(np.mean(zf_ssim)), 4),
        "zero_filled_nmse": round(float(np.mean(zf_nmse)), 5),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--compress_coils", type=int, default=0,
                    help="SVD coil compression to N virtual coils")
    ap.add_argument("--num_coils", type=int, default=6)
    ap.add_argument("--coil_modes", type=int, default=0,
                    help="redundant receive array spanning N smooth modes "
                         "(the coil-compression regime)")
    ap.add_argument("--coil_mode_noise", type=float, default=0.02,
                    help="independent per-coil map component on top of the "
                         "coil_modes mixtures (0 = exactly rank-coil_modes)")
    ap.add_argument("--platform", default=None,
                    help="pin the jax platform (e.g. 'cpu' during a TPU "
                         "tunnel outage; quality numbers are "
                         "platform-independent)")
    a = ap.parse_args()
    if a.platform:
        import jax

        jax.config.update("jax_platforms", a.platform)
    main(a.epochs, a.compress_coils, a.num_coils, a.coil_modes,
         a.coil_mode_noise)
