"""Mini experiment matrix on synthetic cine data (TPU).

Reproduces the shape of the reference's documented experiments
(reconstruction_visualisation.ipynb cell 0: XF-{VarNet,CineNet,XPDNet} @4x
and the VarNet dynamic variants @8x) at reduced scale: trains each config on
synthetic beating-phantom volumes and reports test SSIM/NMSE vs the
zero-filled baseline. One JSON line per config.

Usage: python bench/experiments.py [--epochs 25] [--set families|dynamics]
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

TINY = dict(
    varnet=dict(num_cascades=4, sens_chans=6, sens_pools=2, chans=10, pools=3),
    cinenet=dict(num_cascades=4, cg_iters=4, chans=10, pools=3),
    xpdnet=dict(num_cascades=4, sens_chans=6, sens_pools=2, n_scales=2,
                n_filters_per_scale=(8, 16), n_convs_per_scale=(2, 2),
                first_conv_n_filters=8, n_primal=3),
)
CRNN_TINY = dict(
    varnet=dict(num_cascades=4, sens_chans=6, sens_pools=2, chans=12),
    cinenet=dict(num_cascades=4, cg_iters=4, chans=12),
    xpdnet=dict(num_cascades=4, sens_chans=6, sens_pools=2, chans=12, n_primal=3),
)


def run_config(root, family, dynamic_type, acceleration, epochs, bf16=False,
               packed=False):
    from cinemri_tpu.data import (
        CineNetDataTransform,
        RandomMask,
        SliceDataset,
        VarNetDataTransform,
        XPDNetDataTransform,
    )
    from cinemri_tpu.models import build_model
    from cinemri_tpu.ops import metrics as M
    from cinemri_tpu.train import Loader, Trainer, TrainerConfig
    from cinemri_tpu.cli.inference import zero_filled_recon
    from cinemri_tpu.data.transforms import center_crop_to_smallest

    tr_cls = {"varnet": VarNetDataTransform, "cinenet": CineNetDataTransform,
              "xpdnet": XPDNetDataTransform}[family]
    center = 8 if acceleration <= 4 else 6

    def loader(split, shuffle):
        ds = SliceDataset(
            root / split,
            transform=tr_cls(RandomMask([center], [acceleration]),
                             use_seed=(split != "train")),
            maps_cache_dir=root / "maps",
        )
        return Loader(ds, batch_size=1, shuffle=shuffle)

    kwargs = dict((CRNN_TINY if dynamic_type == "CRNN" else TINY)[family])
    if bf16 and family in ("varnet", "cinenet"):
        kwargs["bf16"] = True
    if packed:
        kwargs["packed"] = True
    model = build_model(family, dynamic_type, **kwargs)
    trainer = Trainer(
        model,
        TrainerConfig(epochs=epochs, lr=1e-3, lr_step_size=10 * epochs,
                      compute_train_metrics=False),
        train_loader=loader("train", True),
        test_loader=loader("test", False),
    )
    t0 = time.perf_counter()
    history = trainer.fit()
    train_min = (time.perf_counter() - t0) / 60
    test = trainer.test()

    zf_ssim = []
    for batch in loader("test", False).epoch(0):
        zf = zero_filled_recon(np.asarray(batch["masked_kspace"]))
        tgt, zf = center_crop_to_smallest(batch["target"], zf)
        for i in range(tgt.shape[0]):
            zf_ssim.append(M.ssim(tgt[i], zf[i], maxval=float(batch["max_value"][i])))

    print(json.dumps({
        "config": f"{family}-{dynamic_type}@{acceleration}x"
                  + ("-bf16" if bf16 else "") + ("-packed" if packed else ""),
        "epochs": epochs,
        "train_min": round(train_min, 1),
        "final_loss": round(history[-1]["train_loss"], 4),
        "test_ssim": round(test["ssim"], 4),
        "test_nmse": round(test["nmse"], 5),
        "zero_filled_ssim": round(float(np.mean(zf_ssim)), 4),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--set", default="families", choices=("families", "dynamics"))
    ap.add_argument("--bf16", action="store_true",
                    help="train varnet/cinenet configs with bf16 activations")
    ap.add_argument("--packed", action="store_true",
                    help="apply the CLI auto rule: packed denoisers for "
                         "2D/3D/CRNN (cli/common.py)")
    args = ap.parse_args()

    from cinemri_tpu.data.synthetic import make_synthetic_dataset

    root = Path(tempfile.mkdtemp(prefix="experiments_"))
    make_synthetic_dataset(root, splits=("train", "test"), volumes_per_split=4,
                           num_frames=8, num_coils=6, h=64, w=64, noise=2e-3)

    if args.set == "families":
        # the notebook's XF-{VarNet,CineNet,XPDNet} @4x
        configs = [("varnet", "XF", 4), ("cinenet", "XF", 4), ("xpdnet", "XF", 4)]
    else:
        # the notebook's VarNet dynamics @8x
        configs = [("varnet", d, 8) for d in ("2D", "3D", "XT", "XF", "CRNN")]

    for family, dyn, acc in configs:
        try:
            run_config(root, family, dyn, acc, args.epochs, bf16=args.bf16,
                       packed=args.packed and dyn in ("2D", "3D", "CRNN"))
        except Exception as e:
            print(json.dumps({"config": f"{family}-{dyn}@{acc}x",
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
