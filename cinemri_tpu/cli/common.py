"""Shared CLI plumbing for the three train/test entry points.

Parity target: reference traintest_scripts/{varnet,cinenet,xpdnet}/
train_test_*.py — argument surface, per-model defaults (SURVEY Appendix B),
mode dispatch (train / test / inference), checkpoint resume semantics.
Differences by design: unified ``--center_lines`` vs ``--center_fractions``
semantics are kept as in the reference (count for random masks, fraction
for equispaced — documented in data/masks.py), and the ``dirs_path.yaml``
location is an argument instead of a hardcoded absolute path.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path
from typing import Dict

from cinemri_tpu.data import (
    CineNetDataTransform,
    CombinedSliceDataset,
    SliceDataset,
    VarNetDataTransform,
    XPDNetDataTransform,
    create_mask_for_mask_type,
)
from cinemri_tpu.models import build_model
from cinemri_tpu.train import Loader, Trainer, TrainerConfig
from cinemri_tpu.utils.paths import fetch_dir

__all__ = ["build_parser", "train_test_main"]

TRANSFORMS = {
    "varnet": VarNetDataTransform,
    "cinenet": CineNetDataTransform,
    "xpdnet": XPDNetDataTransform,
}

MODEL_DEFAULTS: Dict[str, Dict] = {
    # reference per-script set_defaults (train_test_varnet.py:249-262 etc.)
    "varnet": dict(num_cascades=10, pools=3, chans=16, sens_pools=3, sens_chans=8),
    "cinenet": dict(num_cascades=10, CG_iters=6, chans=16, pools=3),
    "xpdnet": dict(
        num_cascades=9,
        sens_chans=8,
        sens_pools=3,
        crnn_chans=18,
        n_scales=3,
        n_filters_per_scale=[16, 32, 64],
        n_convs_per_scale=[2, 2, 2],
        n_first_convs=1,
        first_conv_n_filters=16,
        res=False,
        primal_only=True,
        n_primal=5,
        n_dual=1,
    ),
}


def build_parser(family: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=f"Train/test dynamic {family} on TPU")

    # basic args (train_test_varnet.py:158-205)
    p.add_argument("--mode", default="train", choices=("train", "test", "export"))
    p.add_argument("--epochs", default=150, type=int)
    p.add_argument("--save_checkpoint", default=0, choices=(0, 1), type=int)
    p.add_argument("--resume_training", default=0, choices=(0, 1), type=int)
    # default resolves per mode: 0 for train/test (reference semantics,
    # train_test_varnet.py:59-67) but 1 for export — exporting freshly
    # initialized weights is never what a user wants (ADVICE r2)
    p.add_argument("--load_model", default=None, choices=(0, 1), type=int)
    # migration path for reference users: start from their trained torch
    # Lightning checkpoint (interop.import_torch_checkpoint)
    p.add_argument("--from_torch_ckpt", default=None, type=Path,
                   help="initialize weights from a trained reference "
                        "PyTorch/Lightning .ckpt; combine with --mode test "
                        "for drop-in evaluation or --mode train to fine-tune")
    p.add_argument("--inference", default=1, choices=(0, 1), type=int)
    # --mode export: write a weight-baked StableHLO serving artifact
    # (serve.export_model) shaped like the first test batch
    p.add_argument("--export_path", default=None, type=str,
                   help="output artifact path (default save_path/<family>_<dynamic>.stablehlo)")
    p.add_argument("--serial_export", default=0, choices=(0, 1), type=int,
                   help="bake serve.serial_batch into the artifact (batch>1 serving)")
    p.add_argument("--kernel_dc", default=1, choices=(0, 1), type=int,
                   help="precomputed-kernel data consistency (zero per-cascade "
                        "DFTs, physics.soft_dc_image_kernel); 0 = the "
                        "reference's direct k-space formulation")
    p.add_argument("--packed", default=None, choices=(0, 1), type=int,
                   help="space-to-depth lane packing of the conv stacks "
                        "(denoisers/packed_unet.py) — numerically identical, "
                        "same checkpoints. Default: on for 2D/3D/CRNN "
                        "(measured 1.5-3.1x), off for XF/XT whose plane "
                        "batches are already near their op-mix ceiling "
                        "(varnet/cinenet families)")
    p.add_argument("--bf16", default=0, choices=(0, 1), type=int,
                   help="bfloat16 denoiser activations (params/optimizer/"
                        "DC/loss stay f32) — ~halves activation HBM "
                        "traffic; NOT bit-exact. Trained quality is "
                        "certified (BASELINE.md bf16 parity rows) for the "
                        "dynamic types in cli.common.BF16_CERTIFIED; other "
                        "variants run fine but warn that only inference "
                        "throughput was measured for them")
    if family == "xpdnet":
        p.add_argument(
            "--norm_buffers", default=-1, choices=(-1, 0, 1), type=int,
            help="per-channel normalization of the MWCNN buffer inputs "
                 "(XPDNetBlock._apply_net) — -1 = auto: on exactly under "
                 "--bf16, the certified combination (BASELINE.md 'bf16 "
                 "activation mode'). Forcing 0/1 selects a DIFFERENT "
                 "trained function (not a rounding variation); use only "
                 "to eval a checkpoint trained with the other setting")

    # mask args (train_test_varnet.py:208-229)
    p.add_argument("--mask_type", default="random", choices=("random", "equispaced"))
    p.add_argument(
        "--use_seed", default=0, choices=(0, 1), type=int,
        help="Seed each sample's mask from its filename (deterministic "
             "across epochs/processes); the reference scripts pass False "
             "(train_test_varnet.py:34-36)",
    )
    p.add_argument(
        "--center_fractions",
        nargs="+",
        default=[10],
        type=float,
        help="Random mask: COUNT of central lines; equispaced: FRACTION",
    )
    p.add_argument("--accelerations", nargs="+", default=[4], type=int)

    # data args (data_module.py:252-315)
    p.add_argument("--path_config", default="dirs_path.yaml", type=Path)
    p.add_argument("--data_path", default=None, type=Path)
    p.add_argument("--test_path", default=None, type=Path)
    p.add_argument("--test_split", default="test", choices=("test", "challenge"))
    p.add_argument("--sample_rate", default=None, type=float)
    p.add_argument("--volume_sample_rate", default=None, type=float)
    p.add_argument(
        "--num_cols", nargs="+", default=None, type=int,
        help="Keep only volumes whose phase-encode width is in this list "
             "(the reference's mri_data.py:258-261 filter)",
    )
    # preprocess constants — the reference hardcodes these inside
    # __getitem__ (mri_data.py:272-277); here they are flags so other
    # acquisition protocols need zero code change
    p.add_argument(
        "--crop_shape", nargs=2, default=None, type=int, metavar=("NX", "NY"),
        help="Preprocess center-crop; reference hardcodes (200, 200) "
             "(mri_data.py:274). Auto-shrunk per volume when raw is smaller",
    )
    p.add_argument(
        "--crop_target", nargs=2, default=None, type=int, metavar=("NX", "NY"),
        help="Ground-truth target crop; reference hardcodes (180, 180)",
    )
    p.add_argument(
        "--n_slices", default=None, type=int,
        help="Temporal frames kept per volume; reference hardcodes 15",
    )
    _bool = lambda v: str(v).lower() in ("1", "true", "yes")
    p.add_argument("--use_dataset_cache_file", default=True, type=_bool)
    p.add_argument("--combine_train_val", default=False, type=_bool)
    p.add_argument("--batch_size", default=1, type=int)
    p.add_argument("--maps_cache_dir", default=None, type=Path,
                   help="Cache dir for preprocessed volumes + ESPIRiT maps")
    p.add_argument("--ram_cache_volumes", default=8, type=int,
                   help="In-process LRU of decoded volumes (~100 MB each at "
                        "protocol size); warm epochs then read no disk. "
                        "0 disables")
    p.add_argument(
        "--cache_sens_maps", default=0, choices=(0, 1), type=int,
        help="CineNet only: compute per-sample ESPIRiT maps once per volume "
             "instead of per epoch (reference recomputes each epoch)",
    )
    p.add_argument(
        "--compress_coils", default=0, type=int,
        help="SVD coil compression to this many virtual coils (0 = off, the "
             "reference behavior). Every coil-linear cost (sens U-Nets, CG "
             "coil streams, DC) scales with the coil count; quality cost is "
             "the discarded singular values (data/compress.py)",
    )
    p.add_argument("--num_workers", default=4, type=int,
                   help="Decode-thread pool size of the host input pipeline "
                        "(the reference's DataLoader worker count, "
                        "data_module.py:196-202); 0 disables prefetch, 1 = "
                        "serial decode in the prefetch thread")

    # parallelism (the reference's --accelerator dp/ddp + --gpus,
    # train_test_varnet.py:286-297): shard the batch over a `data` mesh axis
    p.add_argument(
        "--num_devices", default=1, type=int,
        help="Devices on the data-parallel mesh axis; 0 = all visible "
             "devices; 1 = single device (no mesh). The per-device batch is "
             "--batch_size, so the global batch is batch_size x num_devices "
             "(DDP semantics).",
    )
    p.add_argument(
        "--coil_devices", default=1, type=int,
        help="Devices on the coil (tensor-parallel) mesh axis: the "
             "receive-coil dimension of k-space and sensitivity maps shards "
             "across them and the coil-combine reductions all-reduce over "
             "the mesh (physics.constrain_coil_axis). Composes with "
             "--num_devices and --plane_devices on one mesh (total devices "
             "= product); the dataset's coil count must be divisible by it. "
             "Forces the xla normal backend (Pallas kernels are opaque to "
             "the SPMD partitioner).",
    )
    p.add_argument(
        "--plane_devices", default=1, type=int,
        help="Devices on the plane (sequence-parallel) mesh axis: the XT/XF "
             "rotated-plane batches (b*h and b*w independent (.,t) images "
             "per cascade) shard across them with no halo exchange. "
             "Requires --dynamic_type XT or XF; composes with "
             "--num_devices and --coil_devices on one mesh.",
    )
    # multi-host (the reference's ddp multi-process backend,
    # train_test_varnet.py:288-290): launch one process per host with the
    # same command plus --process_id; jax.distributed.initialize links them
    p.add_argument(
        "--num_processes", default=1, type=int,
        help="Multi-host process count (1 = single process; TPU pods can "
             "also auto-discover with no coordinator args)",
    )
    p.add_argument("--coordinator_address", default=None, type=str,
                   help="host:port of process 0 for jax.distributed")
    p.add_argument("--process_id", default=0, type=int,
                   help="This process's index in [0, num_processes)")

    # model args (varnet_module.py:161-239 etc.)
    for k, v in MODEL_DEFAULTS[family].items():
        if isinstance(v, list):
            p.add_argument(f"--{k}", nargs="+", default=v, type=type(v[0]))
        elif isinstance(v, bool):
            p.add_argument(f"--{k}", default=v, type=lambda s: s in ("1", "true", "True"))
        else:
            p.add_argument(f"--{k}", default=v, type=type(v))
    p.add_argument("--dynamic_type", default="XF",
                   choices=("XF", "XT", "2D", "3D", "CRNN"))
    p.add_argument("--weight_sharing", default=False,
                   type=lambda s: s in ("1", "true", "True"))

    # optimizer args (script defaults lr=1e-4, StepLR(140, 0.01))
    p.add_argument(
        "--torch_init", default=1, choices=(0, 1), type=int,
        help="Initialize weights with the reference torch reset_parameters "
             "statistics (default) instead of flax lecun_normal",
    )
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--lr_step_size", default=140, type=int)
    p.add_argument("--lr_gamma", default=0.01, type=float)
    p.add_argument(
        "--clip_grad_norm", default=0.0, type=float,
        help="Global-norm gradient clip (0 = off, the reference recipe). "
             "Opt-in guard against the rare catastrophic gradient spikes "
             "the clip-free recipe admits (BASELINE.md round-5 full-scale "
             "run: one 2e5-norm sens-net gradient poisoned Adam). Changes "
             "the optimizer-state structure: checkpoints do not resume "
             "across different settings",
    )
    p.add_argument("--weight_decay", default=0.0, type=float)
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--num_log_images", default=2, type=int)  # mri_module.py:505
    _bool2 = lambda v: str(v).lower() in ("1", "true", "yes")
    p.add_argument(
        "--compute_train_metrics", default=True, type=_bool2,
        help="Per-step host-side train NMSE/SSIM (the reference's "
             "training_step_end behavior, mri_module.py:216-293); disable "
             "for maximum step throughput",
    )
    p.add_argument(
        "--log_every_steps", default=1, type=int,
        help="Per-step TensorBoard cadence for training_loss/grad_norm "
             "(the reference logs every step, mri_module.py:211-213); 0 = "
             "per-epoch only. With --compute_train_metrics 0 this also "
             "defers all loss syncs to epoch end (max step throughput)",
    )
    p.add_argument(
        "--profile_steps", default=0, type=int,
        help="Capture an xplane profiler trace of this many training steps "
             "(starting at step 1; step 0 carries the compile) into "
             "--profile_dir; analyze with cinemri_tpu.instrument.opstats. "
             "0 = off. The reference has no profiler (SURVEY §5)",
    )
    p.add_argument(
        "--profile_dir", default=None, type=Path,
        help="Trace output dir (default: <log_dir>/tensorboard/profile)",
    )
    p.add_argument(
        "--device_data_cache", default=1, choices=(0, 1), type=int,
        help="Keep per-sample constants (raw k-space, targets, stable "
             "sens maps) resident in device memory so each step transfers "
             "only the mask; masked k-space is rebuilt on device "
             "(train/device_cache.py — numerically identical, removes "
             "~2 GB/epoch of H2D at protocol scale). Single-device runs "
             "only; mesh runs use sharded placement regardless",
    )
    p.add_argument(
        "--device_data_cache_gb", default=4.0, type=float,
        help="HBM byte budget (GiB) for --device_data_cache (LRU beyond it)",
    )
    return p


# (family, dynamic_type) pairs whose bf16 TRAINED quality carries a measured
# head-to-head ΔSSIM row (BASELINE.md "Trained parity" bf16 sections); other
# combinations run, and have measured inference fps, but no quality row
BF16_CERTIFIED = {
    ("varnet", "XF"), ("varnet", "CRNN"), ("cinenet", "XF"), ("xpdnet", "XF"),
}


def _envelope_notices(family: str, args) -> None:
    """One-line runtime notices when a run leaves the certified parity
    envelope (PARITY.md "Parity envelope notes"). The reference's own habit
    is assert-and-warn at configuration time (varnet_module.py:71-72);
    these are warnings, not errors — every mode is functional, but only
    certified configurations carry a measured ΔSSIM<0.001 claim."""
    import warnings

    if getattr(args, "profile_steps", 0) and args.mode != "train":
        warnings.warn(
            "--profile_steps only traces training steps (Trainer.fit); it "
            f"has no effect in --mode {args.mode}",
            stacklevel=2,
        )
    if args.batch_size > 1:
        warnings.warn(
            f"batch_size={args.batch_size} (PER-DEVICE) is outside the "
            "certified parity envelope: the SSIM loss takes data_range "
            "per-sample here but per-batch in the reference (losses.py:34) "
            "— identical at batch_size=1, deliberately different above it. "
            "Data-parallel global batching (--num_devices N at "
            "batch_size=1) IS certified with linear lr scaling at "
            "protocol-length schedules (PARITY.md)",
            stacklevel=2,
        )
    if (
        args.mode == "train"
        and getattr(args, "num_devices", 1) != 1
        and args.batch_size == 1
        and abs(args.lr - 1e-4) < 1e-12
    ):
        warnings.warn(
            f"--num_devices {args.num_devices} at the default --lr 1e-4: "
            "the certified data-parallel recipe scales lr LINEARLY with "
            "the global batch (--lr {:.0e} here); unscaled lr measured "
            "ΔSSIM −0.23 vs the b=1 schedule at the 30-epoch screen "
            "(BASELINE.md 'Data-parallel trained quality at global "
            "batch 8')".format(1e-4 * (args.num_devices if args.num_devices
                                       else 8)),
            stacklevel=2,
        )
    if (
        getattr(args, "bf16", 0)
        and (family, args.dynamic_type) not in BF16_CERTIFIED
        and args.mode == "train"
    ):
        certified = ", ".join(
            f"{f}-{d}" for f, d in sorted(BF16_CERTIFIED) if f == family
        )
        warnings.warn(
            f"--bf16 with --dynamic_type {args.dynamic_type}: trained "
            f"quality for this {family} variant has no head-to-head ΔSSIM "
            f"row (certified: {certified}); inference throughput was "
            "measured, training works, but the <0.001 parity claim does "
            "not extend to it (BASELINE.md 'Trained parity')",
            stacklevel=2,
        )
    if args.compress_coils:
        warnings.warn(
            f"--compress_coils {args.compress_coils} trades quality for "
            "coil-linear speed and is outside the parity envelope by "
            "construction; certify the chosen V per-acquisition with "
            "bench/parity_head_to_head.py --compress_coils (BASELINE.md "
            "'SVD coil compression quality')",
            stacklevel=2,
        )
    if (
        family == "xpdnet"
        and getattr(args, "norm_buffers", -1) != -1
        and args.dynamic_type == "CRNN"
    ):
        warnings.warn(
            "--norm_buffers has no effect for --dynamic_type CRNN: "
            "XPDNetRNN's BCRNN correction does not route buffers through "
            "MWCNN, so there is nothing to normalize — the flag is ignored",
            stacklevel=2,
        )
    if (
        family == "xpdnet"
        and getattr(args, "norm_buffers", -1) != -1
        and bool(args.norm_buffers) != bool(args.bf16)
        and args.dynamic_type != "CRNN"
    ):
        warnings.warn(
            f"--norm_buffers {args.norm_buffers} overrides the certified "
            f"pairing (normalization on exactly under --bf16): bf16 on raw "
            "buffers deviates beyond the parity budget, and f32+norm is a "
            "function change vs the reference's raw-buffer semantics "
            "(xpdnet.py:474-489) — intended only for evaluating a "
            "checkpoint trained with this setting (BASELINE.md 'bf16 "
            "activation mode')",
            stacklevel=2,
        )


def _build_model_from_args(family: str, args) -> object:
    if family == "varnet":
        kwargs = (
            dict(num_cascades=args.num_cascades, sens_chans=args.sens_chans,
                 sens_pools=args.sens_pools, chans=args.chans)
            if args.dynamic_type == "CRNN"
            else dict(num_cascades=args.num_cascades, sens_chans=args.sens_chans,
                      sens_pools=args.sens_pools, chans=args.chans, pools=args.pools,
                      weight_sharing=args.weight_sharing)
        )
    elif family == "cinenet":
        kwargs = (
            dict(num_cascades=args.num_cascades, cg_iters=args.CG_iters,
                 chans=args.chans)
            if args.dynamic_type == "CRNN"
            else dict(num_cascades=args.num_cascades, cg_iters=args.CG_iters,
                      chans=args.chans, pools=args.pools,
                      weight_sharing=args.weight_sharing)
        )
    else:  # xpdnet
        kwargs = (
            dict(num_cascades=args.num_cascades, sens_chans=args.sens_chans,
                 sens_pools=args.sens_pools, chans=args.crnn_chans,
                 primal_only=args.primal_only, n_primal=args.n_primal,
                 n_dual=args.n_dual)
            if args.dynamic_type == "CRNN"
            else dict(num_cascades=args.num_cascades, sens_chans=args.sens_chans,
                      sens_pools=args.sens_pools, n_scales=args.n_scales,
                      n_filters_per_scale=tuple(args.n_filters_per_scale),
                      n_convs_per_scale=tuple(args.n_convs_per_scale),
                      n_first_convs=args.n_first_convs,
                      first_conv_n_filters=args.first_conv_n_filters, res=args.res,
                      primal_only=args.primal_only, n_primal=args.n_primal,
                      n_dual=args.n_dual, weight_sharing=args.weight_sharing,
                      norm_buffers=(None if args.norm_buffers == -1
                                    else bool(args.norm_buffers)))
        )
    kwargs["kernel_dc"] = bool(args.kernel_dc)
    if getattr(args, "coil_devices", 1) > 1:
        kwargs["coil_axis"] = "coil"  # tensor parallelism over receive coils
    if getattr(args, "plane_devices", 1) > 1:
        if args.dynamic_type not in ("XT", "XF"):
            raise ValueError(
                "--plane_devices shards the XT/XF rotated-plane batches; "
                f"dynamic_type {args.dynamic_type!r} has none"
            )
        kwargs["plane_axis"] = "plane"  # sequence parallelism over planes
    # every denoiser stack (U-Net, MWCNN, CRNN trunk) supports packed/bf16
    packed = args.packed
    if packed is None:  # auto: where the A/B wins (BASELINE.md)
        packed = args.dynamic_type in ("2D", "3D", "CRNN")
    kwargs["packed"] = bool(packed)
    kwargs["bf16"] = bool(args.bf16)
    return build_model(family, args.dynamic_type, **kwargs)


def config_fingerprint(family: str, args) -> str:
    """Short hash of every model-tree-defining argument.

    Scopes the Orbax checkpoint directory (and is stored inside each
    checkpoint) so that runs differing in capacity args — chans, cascades,
    scales, weight sharing — never share a step directory: a shared dir
    would silently skip saves at lower step numbers and crash restores with
    a mismatched parameter tree (ADVICE r2).
    """
    import hashlib

    # compress_coils changes the semantics of trained weights (virtual vs
    # physical coil inputs), not the tree shape — still scope by it
    keys = sorted(MODEL_DEFAULTS[family]) + [
        "dynamic_type", "weight_sharing", "compress_coils",
    ]
    src = [(k, getattr(args, k)) for k in keys]
    if family == "xpdnet" and args.dynamic_type != "CRNN":
        # norm_buffers selects a different trained function on the same
        # tree (XPDNetBlock._apply_net) — scope by the resolved value so
        # raw-buffer and normalized-buffer runs never share a step dir
        resolved = (
            bool(args.bf16) if args.norm_buffers == -1
            else bool(args.norm_buffers)
        )
        # append only when True: resolved=False is byte-identical to the
        # pre-norm_buffers code, and appending it would orphan every f32
        # xpdnet checkpoint trained before the flag existed
        if resolved:
            src.append(("norm_buffers", True))
    return hashlib.sha1(repr(src).encode()).hexdigest()[:8]


def _apply_torch_ckpt(trainer, family: str, args, first) -> None:
    """--from_torch_ckpt: replace the initialized params with a trained
    reference checkpoint's (interop.import_torch_checkpoint)."""
    from cinemri_tpu.interop import check_tree_matches, import_torch_checkpoint

    variables, kwargs, fam, dyn = import_torch_checkpoint(
        args.from_torch_ckpt, family=family
    )
    if kwargs or dyn == "CRNN":
        # the checkpoint knows its own architecture (hparams / CRNN trunk)
        if dyn != args.dynamic_type:
            raise ValueError(
                f"checkpoint is a {fam}-{dyn} model but --dynamic_type is "
                f"{args.dynamic_type}"
            )
    elif args.dynamic_type != "XF" or args.weight_sharing:
        # bare state dict without hparams: trust the CLI's architecture flags
        variables, *_ = import_torch_checkpoint(
            args.from_torch_ckpt,
            family=family,
            dynamic_type=args.dynamic_type,
            weight_sharing=bool(args.weight_sharing),
        )
    if trainer.state is None:
        trainer.init_state(first)
    check_tree_matches(variables, trainer.state.params)
    trainer.state = trainer.state.replace(params=variables)
    print(f"Initialized weights from reference checkpoint {args.from_torch_ckpt}")


def _pin_platform_from_env() -> None:
    """Re-assert ``JAX_PLATFORMS`` via jax.config.

    Some managed environments register an experimental TPU plugin from
    ``sitecustomize`` and overwrite ``JAX_PLATFORMS`` at interpreter start,
    so a user's ``JAX_PLATFORMS=cpu`` export is silently lost — and when the
    remote-TPU tunnel is unreachable, backend discovery then hangs the CLI.
    ``jax.config.update`` wins over the clobbered env var; applying it
    before the first backend touch makes the documented
    ``JAX_PLATFORMS=cpu`` flow work unconditionally.
    """
    import os

    want = os.environ.get("CINEMRI_PLATFORM") or os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass  # already initialized (e.g. called from tests)


def train_test_main(family: str, argv=None) -> Dict:
    """The reference's train_test_main (train_test_varnet.py:22-136).

    Process-global state this run needs (the ambient mesh for
    --coil_devices/--plane_devices, the forced xla normal backend) is
    scoped to the call: the ExitStack restores it on return or error, so
    repeated in-process invocations (tests, notebooks, sweep drivers)
    never see a previous run's mesh or backend.
    """
    from contextlib import ExitStack

    with ExitStack() as _scope:
        return _train_test_main(family, argv, _scope)


def _train_test_main(family: str, argv, _scope) -> Dict:
    from cinemri_tpu.utils.compile_cache import enable_compile_cache

    _pin_platform_from_env()
    enable_compile_cache()
    args = build_parser(family).parse_args(argv)
    if args.load_model is None:
        args.load_model = 1 if args.mode == "export" else 0
    elif args.mode == "export" and not args.load_model:
        import warnings

        warnings.warn(
            "--mode export with --load_model 0 exports RANDOMLY INITIALIZED "
            "weights — only useful for artifact-format testing",
            stacklevel=1,
        )

    _envelope_notices(family, args)
    data_path = args.data_path or fetch_dir("data_path", args.path_config)
    save_path = fetch_dir("save_path", args.path_config)
    log_root = fetch_dir("log_path", args.path_config) / family / f"{family}_logs"
    # scope checkpoints per (dynamic_type, acceleration, model-config hash),
    # mirroring the reference's stamped filename
    # (train_test_varnet.py:270-277) — and fixing its latent trap: an Orbax
    # step dir shared across configs would silently skip saves at lower
    # step numbers and then crash the restore with a mismatched tree
    fingerprint = config_fingerprint(family, args)
    ckpt_dir = (
        log_root
        / "checkpoints"
        / f"{family}_{args.dynamic_type}_acc{args.accelerations[0]}_{fingerprint}"
    )

    # multi-host first (device queries below must see the global topology)
    from cinemri_tpu.parallel import initialize as dist_initialize

    dist_initialize(
        coordinator_address=args.coordinator_address,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    # data-parallel mesh (the reference's dp/ddp backend switch,
    # train_test_varnet.py:286-297): batches shard over a `data` axis and
    # jit's SPMD partitioner emits the gradient all-reduce over ICI
    import jax

    from cinemri_tpu.parallel import make_mesh, make_process_sum, process_info

    n_coil = max(1, args.coil_devices)
    n_plane = max(1, args.plane_devices)
    # validate BEFORE mutating any process-global state (mesh, backend)
    if n_plane > 1 and args.dynamic_type not in ("XT", "XF"):
        raise ValueError(
            "--plane_devices shards the XT/XF rotated-plane batches; "
            f"dynamic_type {args.dynamic_type!r} has none"
        )
    n_devices = (
        args.num_devices
        if args.num_devices > 0
        else max(1, len(jax.devices()) // (n_coil * n_plane))
    )
    total_devices = n_devices * n_coil * n_plane
    if total_devices > len(jax.devices()):
        raise ValueError(
            f"--num_devices {n_devices} x --coil_devices {n_coil} x "
            f"--plane_devices {n_plane} = {total_devices} but only "
            f"{len(jax.devices())} devices visible "
            f"(platform {jax.devices()[0].platform})"
        )
    shape = {"data": n_devices}
    if n_plane > 1:
        shape["plane"] = n_plane
    if n_coil > 1:
        shape["coil"] = n_coil
    if len(shape) > 1:
        # a multi-axis mesh; the models' coil_axis/plane_axis constraints
        # resolve bare PartitionSpecs against the ambient mesh, so set it
        # for the rest of the run (the caller's ExitStack restores it)
        mesh = make_mesh(shape, devices=jax.devices()[:total_devices])
        _scope.enter_context(jax.set_mesh(mesh))
        if n_coil > 1:
            from cinemri_tpu.physics import get_normal_backend, set_normal_backend

            prev_backend = get_normal_backend()
            if prev_backend != "xla":
                print(
                    f"--coil_devices: forcing the xla normal backend for "
                    f"this run (was {prev_backend!r}; pallas kernels are "
                    "opaque to the SPMD partitioner)"
                )
            set_normal_backend("xla")
            _scope.callback(set_normal_backend, prev_backend)
    else:
        mesh = (
            make_mesh({"data": n_devices}, devices=jax.devices()[:n_devices])
            if n_devices > 1
            else None
        )
    rank, world = process_info()
    global_batch = args.batch_size * n_devices
    # each process loads its rank's shard of every global batch; the global
    # array is assembled from the per-process parts (parallel.mesh.shard_batch)
    if global_batch % world != 0:
        raise ValueError(
            f"global batch {global_batch} must divide evenly over "
            f"{world} processes"
        )
    local_batch = global_batch // world

    mask_func = create_mask_for_mask_type(
        args.mask_type, args.center_fractions, args.accelerations
    )
    transform_kwargs = {"mask_func": mask_func, "use_seed": bool(args.use_seed),
                        "compress_coils": args.compress_coils}
    if family == "cinenet":
        transform_kwargs["cache_maps"] = bool(args.cache_sens_maps)
        transform_kwargs["maps_cache_dir"] = args.maps_cache_dir
    transform = TRANSFORMS[family](**transform_kwargs)

    import dataclasses

    from cinemri_tpu.data.dataset import PreprocessConfig

    preprocess = PreprocessConfig()
    if args.crop_shape:
        preprocess = dataclasses.replace(preprocess, crop_shape=tuple(args.crop_shape))
    if args.crop_target:
        preprocess = dataclasses.replace(preprocess, crop_target=tuple(args.crop_target))
    if args.n_slices:
        preprocess = dataclasses.replace(preprocess, n_slices=args.n_slices)

    def make_loader(split, shuffle):
        is_train = split == "train"
        if is_train and args.combine_train_val:
            # merge train+valid for training (data_module.py:156-176)
            ds = CombinedSliceDataset(
                roots=[data_path / "train", data_path / "valid"],
                transforms=[transform, transform],
                use_dataset_cache=args.use_dataset_cache_file,
                dataset_cache_file=log_root / "dataset_cache.pkl",
                sample_rates=(
                    [args.sample_rate] * 2 if args.sample_rate is not None else None
                ),
                volume_sample_rates=(
                    [args.volume_sample_rate] * 2
                    if args.volume_sample_rate is not None
                    else None
                ),
                num_cols=args.num_cols,
                preprocess=preprocess,
                maps_cache_dir=args.maps_cache_dir,
                ram_cache_volumes=args.ram_cache_volumes,
            )
        else:
            root = (
                args.test_path
                if (split == args.test_split and args.test_path)
                else data_path / split
            )
            ds = SliceDataset(
                root,
                transform=transform,
                sample_rate=args.sample_rate if is_train else None,
                volume_sample_rate=args.volume_sample_rate if is_train else None,
                use_dataset_cache=args.use_dataset_cache_file,
                dataset_cache_file=log_root / "dataset_cache.pkl",
                num_cols=args.num_cols,
                preprocess=preprocess,
                maps_cache_dir=args.maps_cache_dir,
                ram_cache_volumes=args.ram_cache_volumes,
            )
        return Loader(
            ds,
            batch_size=local_batch,
            shuffle=shuffle,
            seed=args.seed,
            prefetch_size=2 if args.num_workers > 0 else 0,
            num_workers=max(int(args.num_workers), 1),
            # multi-host: each process feeds its own shard of the example
            # list; eval shards volume-aware so whole volumes stay on one
            # process (the reference's VolumeSampler, data_module.py:189-194)
            num_replicas=world,
            rank=rank,
            volume_aware=not is_train,
        )

    model = _build_model_from_args(family, args)
    cfg = TrainerConfig(
        epochs=args.epochs,
        lr=args.lr,
        lr_step_size=args.lr_step_size,
        lr_gamma=args.lr_gamma,
        clip_grad_norm=args.clip_grad_norm,
        weight_decay=args.weight_decay,
        seed=args.seed,
        ckpt_dir=ckpt_dir,
        log_dir=log_root / "tensorboard",
        save_path=save_path,
        num_log_images=args.num_log_images,
        compute_train_metrics=args.compute_train_metrics,
        torch_init=bool(args.torch_init),
        config_fingerprint=fingerprint,
        profile_steps=args.profile_steps,
        profile_dir=args.profile_dir,
        log_every_steps=args.log_every_steps,
        device_data_cache=bool(args.device_data_cache),
        device_data_cache_gb=args.device_data_cache_gb,
    )
    trainer = Trainer(
        model,
        cfg,
        train_loader=make_loader("train", shuffle=True),
        val_loader=make_loader("valid", shuffle=False),
        test_loader=make_loader(args.test_split, shuffle=False),
        mesh=mesh,
        reduce_fn=make_process_sum(),
    )

    results: Dict = {"trainer": trainer}
    if args.from_torch_ckpt and args.resume_training:
        raise ValueError(
            "--from_torch_ckpt and --resume_training are mutually exclusive"
        )
    if args.mode == "train" and args.from_torch_ckpt:
        _apply_torch_ckpt(
            trainer, family, args, trainer.train_loader.first_batch()
        )
    if args.mode == "train":
        print(
            f"Training {family} {args.dynamic_type} with {args.num_cascades} "
            f"cascades for {args.epochs} epochs.\nData is subsampled with a "
            f"{args.mask_type} mask, acceleration {args.accelerations[0]}."
        )
        t0 = time.perf_counter()
        results["history"] = trainer.fit(resume=bool(args.resume_training))
        print(f"Training time: {(time.perf_counter() - t0) / 3600.} hours")
        if args.save_checkpoint:
            trainer.ckpt.save(args.epochs, trainer._ckpt_tree(args.epochs))
            trainer.ckpt.wait()
    elif args.mode == "test":
        first = trainer.test_loader.first_batch()
        trainer.init_state(first)
        if args.from_torch_ckpt:
            _apply_torch_ckpt(trainer, family, args, first)
        elif args.load_model:
            trainer.restore_latest(first)
        results["test_metrics"] = trainer.test()
        print("test metrics:", results["test_metrics"])

        if args.inference:
            from cinemri_tpu.cli.inference import InferenceRunner

            inf_ds = SliceDataset(
                data_path / "inference",
                transform=transform,
                preprocess=preprocess,
                maps_cache_dir=args.maps_cache_dir,
            )
            runner = InferenceRunner(model, trainer.state.params, family, save_path)
            total = 0.0
            print("Starting inference..............")
            for batch in Loader(inf_ds, batch_size=1).epoch(0):
                total += runner(batch)
            print(f"Elapsed time: {total} seconds.")
            results["inference_seconds"] = total
    elif args.mode == "export":
        import jax.numpy as jnp

        from cinemri_tpu.ops.cplx import from_complex
        from cinemri_tpu.serve import export_model

        first = trainer.test_loader.first_batch()
        trainer.init_state(first)
        if args.from_torch_ckpt:
            _apply_torch_ckpt(trainer, family, args, first)
        elif args.load_model:
            trainer.restore_best(first)  # serve the best-val weights
        km = from_complex(first["masked_kspace"])
        mask = jnp.asarray(first["mask"])
        sens = (
            from_complex(first["sens_maps"]) if family == "cinenet" else None
        )
        out_path = Path(
            args.export_path
            or save_path / f"{family}_{args.dynamic_type}.stablehlo"
        )
        out_path.parent.mkdir(parents=True, exist_ok=True)
        export_model(
            model, trainer.state.params, km, mask,
            path=out_path, sens_maps=sens, serial=bool(args.serial_export),
        )
        print(f"Exported serving artifact to {out_path}")
        results["export_path"] = str(out_path)
    return results
