"""Training / evaluation orchestration.

Replaces the reference's Lightning Trainer wiring (train_test_varnet.py:286-297
+ pl_modules): epoch loop, per-volume metric aggregation, TensorBoard
scalars and cine videos, best-checkpoint tracking on ``validation_loss``,
resume, and the test-time SSIMs.csv artifact. One generic trainer covers all
three model families (their Lightning modules differ only in batch fields).
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cinemri_tpu.parallel.mesh import shard_batch
from cinemri_tpu.train.checkpoint import CheckpointManager
from cinemri_tpu.train.logging import TrainLogger
from cinemri_tpu.train.metrics_agg import MetricsAggregator
from cinemri_tpu.train.optim import make_optimizer
from cinemri_tpu.train.step import create_train_state, make_eval_step, make_train_step

__all__ = ["TrainerConfig", "Trainer"]


@jax.jit
def _stack(parts):
    """Stack per-sample device arrays (or Complex pairs) into a batch."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *parts)


@jax.jit
def _stack_and_mask(ks, mask):
    """Batch cached raw k-space samples and apply this step's mask on
    device — `data * mask + 0.0` exactly as the host transform
    (transforms.py:90 semantics; mask is 0/1 so the product is exact and
    the `+ 0.0` normalizes zero signs the same way)."""
    from cinemri_tpu.ops.cplx import Complex

    k = jax.tree.map(lambda *xs: jnp.stack(xs), *ks)
    return Complex(k.re * mask + 0.0, k.im * mask + 0.0)


def _local_np(x) -> np.ndarray:
    """This process's rows of a (possibly cross-process) batch-sharded array.

    Single-process (or fully replicated) arrays convert whole; on a
    multi-process mesh each host reads back exactly the batch rows its
    loader contributed, in order, so host-side metric aggregation stays
    local + a scalar process-sum (the reference's DistributedMetricSum
    pattern)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        shards = sorted(x.addressable_shards, key=lambda s: s.index[0].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    return np.asarray(x)


@dataclasses.dataclass
class TrainerConfig:
    """Defaults follow the reference train scripts (SURVEY Appendix B)."""

    epochs: int = 150
    lr: float = 1e-4
    lr_step_size: int = 140
    lr_gamma: float = 0.01
    weight_decay: float = 0.0
    # 0 = the reference recipe (no clipping). Opt-in mitigation for the
    # rare catastrophic gradient spikes the clip-free recipe admits
    # (BASELINE.md round-5 full-scale run: one 2e5-norm gradient poisoned
    # Adam and cost ~0.2 SSIM). Changes the opt_state structure, so a
    # checkpoint trained with one setting cannot resume under the other.
    clip_grad_norm: float = 0.0
    seed: int = 42
    ckpt_dir: Optional[Path] = None
    log_dir: Optional[Path] = None
    save_path: Optional[Path] = None  # SSIMs.csv / .npy artifacts
    compute_train_metrics: bool = True
    num_log_images: int = 1
    max_checkpoints: int = 3
    debug_nans: bool = False  # raise at the first NaN-producing op
    checkpoint_on_preemption: bool = True  # SIGTERM -> save before dying
    torch_init: bool = True  # reference torch reset_parameters weight stats
    # short hash of the model-defining config (cli.common.config_fingerprint);
    # stored in every checkpoint and verified on restore so a mismatched
    # parameter tree fails with a clear message instead of an orbax error
    config_fingerprint: str = ""
    # per-step TensorBoard cadence for training_loss/grad_norm (the
    # reference logs the loss every step, mri_module.py:211-213); 0 = only
    # the per-epoch aggregate
    log_every_steps: int = 1
    # capture an xplane trace (instrument.trace) of this many training
    # steps, starting at step 1 so the compile-carrying step 0 stays out
    # of the trace; 0 = off. Analyze with instrument.opstats or
    # bench/profile_forward.py's method. The reference has no profiler at
    # all (SURVEY §5).
    profile_steps: int = 0
    profile_dir: Optional[Path] = None  # default: log_dir/"profile"
    # one-step eval software pipeline (dispatch batch i+1 before pulling
    # batch i's outputs); off = strictly sequential, for A/B measurement
    # (bench/eval_throughput.py) and debugging
    pipeline_eval: bool = True
    # HBM-resident cache of per-sample constants (raw k-space, target,
    # stable sens maps): per-step H2D shrinks from the full masked
    # k-space to the ~12 KB mask, with the mask multiply done on device
    # (train/device_cache.py — removes ~2 GB/epoch of transfers at
    # protocol scale AND bounds this container's per-transfer host-RSS
    # platform leak, see BASELINE.md round-5 training-run anatomy).
    # Single-device path only; mesh runs keep shard_batch. Numerically
    # identical to the host path (mask is 0/1; `k*m + 0.0` both sides).
    device_data_cache: bool = True
    device_data_cache_gb: float = 4.0


class Trainer:
    def __init__(
        self,
        model,
        config: TrainerConfig,
        train_loader=None,
        val_loader=None,
        test_loader=None,
        mesh=None,
        reduce_fn: Callable[[float], float] = lambda x: x,
    ):
        self.model = model
        self.cfg = config
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.test_loader = test_loader
        self.mesh = mesh
        self.reduce_fn = reduce_fn
        self.logger = TrainLogger(config.log_dir, enabled=config.log_dir is not None)
        self.ckpt = (
            CheckpointManager(config.ckpt_dir, config.max_checkpoints, "val_loss")
            if config.ckpt_dir is not None
            else None
        )
        if config.debug_nans:
            from cinemri_tpu.instrument import enable_nan_checks

            enable_nan_checks(True)
        self._train_step = make_train_step(mesh=mesh)
        self._eval_step = make_eval_step()
        self.state = None
        self.rng = None
        self.history: List[Dict[str, float]] = []
        self._dev_cache = None
        if config.device_data_cache and mesh is None:
            from cinemri_tpu.train.device_cache import DeviceSampleCache

            self._dev_cache = DeviceSampleCache(
                int(config.device_data_cache_gb * (1 << 30))
            )
        self._dataset_paths: Dict[int, Dict[str, object]] = {}

    # ---------------------------------------------------------- device data

    def _place_batch(self, batch, loader):
        """Device placement for one batch.

        Mesh runs (and anything the cache cannot prove constant) go
        through :func:`shard_batch`. The single-device path routes the
        per-sample constants through :class:`DeviceSampleCache`: raw
        k-space and target transfer ONCE per sample for the whole run,
        and the masked k-space is rebuilt on device from this step's
        mask (`k*m + 0.0`, identical to the host transform,
        transforms.py:90 semantics). CineNet sens maps are cached only
        when the transform pins them per sample (``cache_maps=True``);
        reference-semantics per-epoch maps keep the host path for
        correctness.
        """
        ds = getattr(loader, "dataset", None) if loader is not None else None
        tf = getattr(ds, "transform", None)
        sens_stable = "sens_maps" not in batch or bool(
            getattr(tf, "cache_maps", False)
        )
        if (
            self._dev_cache is None
            or ds is None
            or not hasattr(ds, "_load_decoded")
            or "masked_kspace" not in batch
            or getattr(tf, "compress_coils", 0)
            or not sens_stable
        ):
            return shard_batch(batch, self.mesh)

        paths = self._dataset_paths.get(id(ds))
        if paths is None:
            paths = {ex.fname.name: ex.fname for ex in ds.examples}
            self._dataset_paths[id(ds)] = paths

        import jax.numpy as jnp

        ks, tgts, sens = [], [], []
        for i, fname in enumerate(batch["fname"]):
            key = (id(ds), fname, int(batch["slice_num"][i]))
            dev = self._dev_cache.get(
                key,
                lambda i=i, fname=fname: {
                    "kspace": ds._load_decoded(paths[fname])["kspace"],
                    "target": batch["target"][i],
                    "sens_maps": (
                        batch["sens_maps"][i] if "sens_maps" in batch else None
                    ),
                },
            )
            ks.append(dev["kspace"])
            tgts.append(dev["target"])
            sens.append(dev["sens_maps"])

        mask = jnp.asarray(batch["mask"])  # ~KBs — the only per-step put
        out = {
            "masked_kspace": _stack_and_mask(tuple(ks), mask),
            "mask": mask,
            "target": _stack(tuple(tgts)),
        }
        if sens[0] is not None:
            out["sens_maps"] = _stack(tuple(sens))
        if "sample_weight" in batch:
            out["sample_weight"] = jnp.asarray(batch["sample_weight"])
        return out

    # ------------------------------------------------------------------ setup

    def init_state(self, example_batch):
        steps_per_epoch = (
            self.train_loader.steps_per_epoch() if self.train_loader else 1
        )
        tx = make_optimizer(
            lr=self.cfg.lr,
            lr_step_size=self.cfg.lr_step_size,
            lr_gamma=self.cfg.lr_gamma,
            weight_decay=self.cfg.weight_decay,
            steps_per_epoch=steps_per_epoch,
            clip_grad_norm=self.cfg.clip_grad_norm,
        )
        arrays = shard_batch(example_batch, self.mesh)
        init_rng, self.rng = jax.random.split(jax.random.PRNGKey(self.cfg.seed))
        self.state = create_train_state(
            self.model,
            arrays,
            tx,
            rng=init_rng,
            torch_init=self.cfg.torch_init,
        )
        if self.mesh is not None and len(self.mesh.devices.flat) > jax.local_device_count():
            # multi-process mesh: replicate the state globally so the jitted
            # step sees committed global arrays on every host
            from cinemri_tpu.parallel.mesh import replicated_sharding

            self.state = jax.device_put(self.state, replicated_sharding(self.mesh))
        return self.state

    def _ckpt_tree(self, epoch: int):
        """Full resume tree (SURVEY §5): params, optimizer state, step
        counter, epoch, the trainer PRNG key, and the model-config
        fingerprint. The PRNG key is the only post-init randomness source
        the trainer owns (mask RNG is host-side, reseeded per epoch by the
        Loader; dropout is off at reference defaults), so a restored run is
        bit-continuous — asserted by tests/test_train.py resume tests."""
        import numpy as np

        return {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": int(self.state.step),
            "epoch": epoch,
            "rng": np.asarray(self.rng),  # legacy uint32 key array
            "fingerprint": np.frombuffer(
                self.cfg.config_fingerprint.ljust(8, "0")[:8].encode(), np.uint8
            ).copy(),
        }

    def _check_fingerprint(self, restored):
        saved = bytes(np.asarray(restored.get("fingerprint", []))).decode(
            errors="replace"
        )
        want = self.cfg.config_fingerprint.ljust(8, "0")[:8]
        if saved and self.cfg.config_fingerprint and saved != want:
            raise ValueError(
                f"checkpoint in {self.ckpt.directory} was saved with model "
                f"config fingerprint {saved!r} but this run is {want!r} — "
                "the parameter trees differ; point --path_config at the "
                "matching run or delete the stale checkpoint dir"
            )

    def restore_latest(self, example_batch) -> int:
        """Restore the newest checkpoint; returns the next epoch index."""
        if self.state is None:
            self.init_state(example_batch)
        restored = self.ckpt.restore(self._ckpt_tree(0))
        self._check_fingerprint(restored)
        self.state = self.state.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=int(restored["step"]),
        )
        if "rng" in restored:
            import jax.numpy as jnp

            self.rng = jnp.asarray(np.asarray(restored["rng"], np.uint32))
        return int(restored["epoch"]) + 1

    def restore_best(self, example_batch):
        if self.state is None:
            self.init_state(example_batch)
        step = self.ckpt.best_step if self.ckpt.best_step is not None else None
        restored = self.ckpt.restore(self._ckpt_tree(0), step=step)
        self._check_fingerprint(restored)
        self.state = self.state.replace(params=restored["params"])
        return self.state

    # ------------------------------------------------------------------ loops

    def _run_eval(self, loader, epoch: int, split: str, ssim_csv=None) -> Dict:
        agg = MetricsAggregator(self.reduce_fn, ssim_csv_path=ssim_csv)
        logged = 0

        def consume(batch, aux):
            nonlocal logged
            out = _local_np(aux["output"])
            tgt = _local_np(aux["target"])
            agg.update_batch(batch, out, tgt, loss=float(aux["loss"]))
            if logged < self.cfg.num_log_images:
                self.logger.cine_video(
                    f"{split}_images_idx_{logged}", tgt[0], out[0], int(self.state.step)
                )
                logged += 1

        # one-step software pipeline: dispatch batch i+1's forward (async)
        # before pulling batch i's outputs, so device compute overlaps the
        # device->host transfer + host-side metric work (D2H is the eval
        # loop's dominant cost on remote-dispatch backends).
        # cfg.pipeline_eval=False runs strictly sequentially (A/B path).
        prev = None
        for batch in loader.epoch(epoch):
            aux = self._eval_step(self.state, self._place_batch(batch, loader))
            if not self.cfg.pipeline_eval:
                consume(batch, aux)
                continue
            if prev is not None:
                consume(*prev)
            prev = (batch, aux)
        if prev is not None:
            consume(*prev)
        metrics = agg.compute()
        self.logger.scalars(
            {f"{split}_metrics/{k}": v for k, v in metrics.items() if k != "loss"},
            int(self.state.step),
        )
        if "loss" in metrics:
            self.logger.scalars({f"{split}_loss": metrics["loss"]}, int(self.state.step))
        return metrics

    def fit(self, resume: bool = False) -> List[Dict[str, float]]:
        assert self.train_loader is not None, "fit() needs a train loader"
        first_batch = self.train_loader.first_batch()
        start_epoch = 0
        if resume and self.ckpt is not None and self.ckpt.latest_step is not None:
            start_epoch = self.restore_latest(first_batch)
        elif self.state is None:
            self.init_state(first_batch)

        # preemption safety (SURVEY §5: the reference has no failure
        # handling): on SIGTERM — what TPU preemption delivers — save the
        # current state before exiting so fit(resume=True) continues.
        prev_handler = None
        self._epoch_in_flight = start_epoch

        def _on_sigterm(signum, frame):
            if self.ckpt is not None and self.state is not None:
                # save under the interrupted epoch's id with epoch-1 recorded,
                # so fit(resume=True) re-runs the interrupted epoch and its
                # eventual completion save overwrites this checkpoint (epoch
                # ids stay the orbax step keys — a larger synthetic id would
                # shadow all later epoch saves in restore_latest)
                self.ckpt.save(
                    self._epoch_in_flight,
                    self._ckpt_tree(self._epoch_in_flight - 1),
                )
                self.ckpt.wait()
            raise SystemExit(143)

        if self.cfg.checkpoint_on_preemption and self.ckpt is not None:
            import signal
            import threading

            if threading.current_thread() is threading.main_thread():
                prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)

        # --profile_steps: trace a window of steps, skipping THIS process's
        # first step (it carries the jit compile even on resume, where the
        # global state.step is already > 0)
        prof_ctx = None
        prof_remaining = max(0, self.cfg.profile_steps)
        steps_this_process = 0
        pending_losses: List = []  # deferred on-device loss scalars

        t0 = time.perf_counter()
        try:
            for epoch in range(start_epoch, self.cfg.epochs):
                self._epoch_in_flight = epoch
                agg = MetricsAggregator(self.reduce_fn)
                for batch in self.train_loader.epoch(epoch):
                    if prof_remaining > 0 and prof_ctx is None and steps_this_process >= 1:
                        from cinemri_tpu.instrument import trace

                        pdir = self.cfg.profile_dir or (
                            (self.cfg.log_dir or Path(".")) / "profile"
                        )
                        prof_ctx = trace(pdir)
                        prof_ctx.__enter__()
                    arrays = self._place_batch(batch, self.train_loader)
                    self.state, aux = self._train_step(self.state, arrays)
                    steps_this_process += 1
                    n_real = int(np.sum(batch["sample_weight"] > 0)) if "sample_weight" in batch else len(batch["fname"])
                    # max-throughput mode (no per-step logging, no train
                    # metrics): keep the loss scalar on device and let steps
                    # pipeline; one sync at epoch end instead of one per step
                    # (host<->device round-trips are the loop's only sync, and
                    # they are expensive on remote-dispatch backends)
                    defer_loss = (
                        not self.cfg.compute_train_metrics
                        and not self.cfg.log_every_steps
                        and prof_ctx is None
                    )
                    if defer_loss:
                        pending_losses.append((aux["loss"], n_real))
                        continue
                    loss = float(aux["loss"])
                    if prof_ctx is not None:
                        # the loss sync above drained the step, so the trace
                        # window holds complete device activity
                        prof_remaining -= 1
                        if prof_remaining <= 0:
                            prof_ctx.__exit__(None, None, None)
                            prof_ctx = None
                    step = int(self.state.step)
                    if self.cfg.log_every_steps and step % self.cfg.log_every_steps == 0:
                        # per-step loss + grad norm (the reference logs the loss
                        # each training_step_end, mri_module.py:211-213)
                        self.logger.scalars(
                            {
                                "training_loss_step": loss,
                                "grad_norm": float(aux["grad_norm"]),
                            },
                            step,
                        )
                    if self.cfg.compute_train_metrics:
                        agg.update_batch(
                            batch,
                            _local_np(aux["output"]),
                            _local_np(aux["target"]),
                            loss=loss,
                        )
                    else:
                        agg.add_loss(loss, n_real)

                if pending_losses:
                    # ONE bulk device->host transfer for every queued scalar
                    # (per-scalar float() would re-pay a round-trip per step)
                    values = jax.device_get([l for l, _ in pending_losses])
                    for v, (_, n) in zip(values, pending_losses):
                        agg.add_loss(float(v), n)
                    pending_losses.clear()
                epoch_metrics = (
                    agg.compute()
                    if self.cfg.compute_train_metrics
                    else {"loss": agg.loss_value()}
                )
                record = {f"train_{k}": v for k, v in epoch_metrics.items()}
                self.logger.scalars(
                    {"training_loss": epoch_metrics.get("loss", 0.0)}, int(self.state.step)
                )
                self.logger.scalars(
                    {
                        f"train_metrics/{k}": v
                        for k, v in epoch_metrics.items()
                        if k != "loss"
                    },
                    int(self.state.step),
                )

                if self.val_loader is not None:
                    val = self._run_eval(self.val_loader, epoch, "val")
                    record.update({f"val_{k}": v for k, v in val.items()})
                    self.logger.scalars(
                        {"validation_loss": val.get("loss", 0.0)}, int(self.state.step)
                    )
                record["epoch"] = epoch
                self.history.append(record)

                if self.ckpt is not None:
                    self.ckpt.save(
                        epoch,
                        self._ckpt_tree(epoch),
                        metrics={"val_loss": record.get("val_loss", record.get("train_loss", 0.0))},
                    )
        finally:
            # close the trace on ANY exit (debug_nans raise, loader error,
            # SIGTERM preemption SystemExit) so a partial window still
            # flushes instead of leaving jax.profiler running
            if prof_ctx is not None:
                prof_ctx.__exit__(None, None, None)
            if prev_handler is not None:
                import signal

                signal.signal(signal.SIGTERM, prev_handler)
        if self.ckpt is not None:
            self.ckpt.wait()
        self.train_time_hours = (time.perf_counter() - t0) / 3600.0
        return self.history

    def test(self, epoch: int = 0) -> Dict[str, float]:
        assert self.test_loader is not None, "test() needs a test loader"
        csv = (
            Path(self.cfg.save_path) / "SSIMs.csv"
            if self.cfg.save_path is not None
            else None
        )
        return self._run_eval(self.test_loader, epoch, "test", ssim_csv=csv)
