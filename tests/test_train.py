"""Training-system tests: optimizer schedule, steps, metrics aggregation,
checkpointing, and the end-to-end tiny-train smoke test."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cinemri_tpu.data import RandomMask, SliceDataset, VarNetDataTransform
from cinemri_tpu.data.synthetic import make_synthetic_dataset
from cinemri_tpu.models import build_model
from cinemri_tpu.train import (
    CheckpointManager,
    Loader,
    MetricsAggregator,
    Trainer,
    TrainerConfig,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    step_decay_schedule,
)
from cinemri_tpu.ops import metrics as M

TINY = dict(num_cascades=2, sens_chans=4, sens_pools=2, chans=4, pools=2)


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("traindata")
    return make_synthetic_dataset(
        root,
        splits=("train", "valid", "test"),
        volumes_per_split=2,
        num_frames=5,
        num_coils=4,
        h=32,
        w=32,
    )


def _loader(data_root, split, tmp_path, shuffle=False, batch_size=1):
    ds = SliceDataset(
        data_root / split,
        transform=VarNetDataTransform(RandomMask([6], [2]), use_seed=True),
        maps_cache_dir=tmp_path / f"maps_{split}",
    )
    return Loader(ds, batch_size=batch_size, shuffle=shuffle)


class TestOptim:
    def test_step_decay_schedule(self):
        s = step_decay_schedule(1e-4, step_size_epochs=2, gamma=0.1, steps_per_epoch=10)
        assert s(0) == pytest.approx(1e-4)
        assert s(19) == pytest.approx(1e-4)  # epoch 1
        assert s(20) == pytest.approx(1e-5)  # epoch 2
        assert s(45) == pytest.approx(1e-6)  # epoch 4

    def test_clip_grad_norm_protects_later_steps(self):
        """A catastrophic gradient poisons Adam's second moment so the NEXT
        (normal) step's update collapses; clipping bounds the poisoning.
        This is the round-5 full-scale failure mode in miniature
        (BASELINE.md: one 2e5-norm gradient froze training quality)."""
        import jax.numpy as jnp
        import optax

        from cinemri_tpu.train import make_optimizer

        params = {"w": jnp.zeros((4,))}
        spike = {"w": jnp.full((4,), 1e6)}
        normal = {"w": jnp.full((4,), 1e-2)}

        def late_update_norm(clip, n=50):
            # Adam's first moment forgets the spike in ~1/(1-b1)=10 steps
            # but the second moment holds it for ~1/(1-b2)=1000, so the
            # collapse shows in the updates BETWEEN those horizons
            tx = make_optimizer(lr=1e-4, steps_per_epoch=1,
                                clip_grad_norm=clip)
            st = tx.init(params)
            u, st = tx.update(spike, st, params)
            for _ in range(n):
                u, st = tx.update(normal, st, params)
            return float(optax.global_norm(u))

        poisoned = late_update_norm(0.0)
        guarded = late_update_norm(1.0)
        assert guarded > 20 * poisoned  # spike no longer dominates moments

    def test_weight_decay_matches_torch_adam_semantics(self):
        import optax

        params = {"w": jnp.asarray([2.0])}
        grads = {"w": jnp.asarray([0.0])}
        tx = make_optimizer(lr=0.1, weight_decay=0.5, steps_per_epoch=1, lr_step_size=1000)
        st = tx.init(params)
        # zero gradient + weight decay → the effective gradient is wd·θ ≠ 0
        updates, _ = tx.update(grads, st, params)
        assert float(jnp.abs(updates["w"][0])) > 0


class TestStepsAndMetrics:
    def test_train_step_decreases_loss(self, data_root, tmp_path):
        loader = _loader(data_root, "train", tmp_path)
        from cinemri_tpu.parallel import shard_batch

        batch = next(iter(loader.epoch(0)))
        arrays = shard_batch(batch, None)
        model = build_model("varnet", "XF", **TINY)
        tx = make_optimizer(lr=3e-3, steps_per_epoch=1)
        state = create_train_state(model, arrays, tx)
        step = make_train_step(donate=False)
        state, aux0 = step(state, arrays)
        for _ in range(8):
            state, aux = step(state, arrays)
        assert float(aux["loss"]) < float(aux0["loss"])
        assert np.isfinite(float(aux["grad_norm"]))

    def test_metrics_aggregator_matches_reference_recipe(self, rng):
        agg = MetricsAggregator()
        vols = {}
        for fname in ("a", "b"):
            for sl in range(2):
                tgt = rng.random((3, 24, 24)).astype(np.float32)
                out = tgt + 0.05 * rng.standard_normal((3, 24, 24)).astype(np.float32)
                maxv = tgt.max()
                agg.update(fname, sl, out, tgt, maxv)
                vols.setdefault(fname, []).append((tgt, out, maxv))
        got = agg.compute()
        # recompute by hand (mri_module.py:180-205)
        nmse = psnr = ssim = 0.0
        for fname, entries in vols.items():
            mses = [M.mse(t, o) for t, o, _ in entries]
            norms = [M.mse(t, np.zeros_like(t)) for t, o, _ in entries]
            maxv = entries[-1][2]
            nmse += np.mean(mses) / np.mean(norms)
            psnr += 20 * np.log10(maxv) - 10 * np.log10(np.mean(mses))
            ssim += np.mean([M.ssim(t, o, maxval=mv) for t, o, mv in entries])
        np.testing.assert_allclose(got["nmse"], nmse / 2, rtol=1e-6)
        np.testing.assert_allclose(got["psnr"], psnr / 2, rtol=1e-6)
        np.testing.assert_allclose(got["ssim"], ssim / 2, rtol=1e-6)

    def test_aggregator_duplicate_slices_overwrite(self, rng):
        agg = MetricsAggregator()
        tgt = rng.random((2, 16, 16)).astype(np.float32)
        agg.update("a", 0, tgt * 0.5, tgt, tgt.max())
        agg.update("a", 0, tgt, tgt, tgt.max())  # duplicate wins
        assert agg.compute()["ssim"] == pytest.approx(1.0)

    def test_ssim_csv_artifact(self, tmp_path, rng):
        csv_path = tmp_path / "SSIMs.csv"
        agg = MetricsAggregator(ssim_csv_path=csv_path)
        tgt = rng.random((2, 16, 16)).astype(np.float32)
        agg.update("a", 0, tgt, tgt, tgt.max())
        agg.update("a", 1, tgt, tgt, tgt.max())
        lines = csv_path.read_text().strip().splitlines()
        assert len(lines) == 2
        assert float(lines[0]) == pytest.approx(1.0)


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        mgr = CheckpointManager(tmp_path / "ckpt", monitor="val_loss")
        tree = {"params": {"w": jnp.arange(4.0)}, "step": 7, "epoch": 1}
        mgr.save(1, tree, metrics={"val_loss": 0.9})
        mgr.save(2, {**tree, "step": 9}, metrics={"val_loss": 0.4})
        mgr.save(3, {**tree, "step": 11}, metrics={"val_loss": 0.6})
        mgr.wait()
        assert mgr.latest_step == 3
        assert mgr.best_step == 2  # min val_loss
        restored = mgr.restore(tree, step=mgr.best_step)
        assert int(restored["step"]) == 9
        np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), np.arange(4.0))

    def test_restore_missing_raises(self, tmp_path):
        mgr = CheckpointManager(tmp_path / "empty")
        with pytest.raises(FileNotFoundError):
            mgr.restore({"x": jnp.zeros(1)})


class TestEndToEnd:
    def test_tiny_train_improves_over_zero_filled(self, data_root, tmp_path):
        """Smoke train: 3 epochs of tiny VarNet-XF on the synthetic set must
        beat the pre-training model on SSIM and drive the loss down."""
        cfg = TrainerConfig(
            epochs=3,
            lr=3e-3,
            ckpt_dir=tmp_path / "ckpt",
            log_dir=None,
            compute_train_metrics=False,
        )
        trainer = Trainer(
            build_model("varnet", "XF", **TINY),
            cfg,
            train_loader=_loader(data_root, "train", tmp_path, shuffle=True),
            val_loader=_loader(data_root, "valid", tmp_path),
            test_loader=_loader(data_root, "test", tmp_path),
        )
        history = trainer.fit()
        assert len(history) == 3
        assert history[-1]["train_loss"] < history[0]["train_loss"]
        test_metrics = trainer.test()
        assert 0 < test_metrics["ssim"] <= 1
        assert (tmp_path / "ckpt").exists()

    def test_device_data_cache_matches_host_path(self, data_root, tmp_path):
        """The HBM-resident sample cache (train/device_cache.py) must be a
        pure placement change: training with it on and off from the same
        init over the same epochs yields identical losses and parameters
        (the on-device `k*m + 0.0` equals the host transform's)."""
        import jax

        def run(flag, sub):
            cfg = TrainerConfig(
                epochs=2, lr=1e-3, ckpt_dir=None, log_dir=None,
                compute_train_metrics=False, device_data_cache=flag,
            )
            trainer = Trainer(
                build_model("varnet", "XF", **TINY),
                cfg,
                train_loader=_loader(data_root, "train", tmp_path / sub,
                                     shuffle=True),
                val_loader=_loader(data_root, "valid", tmp_path / sub),
            )
            history = trainer.fit()
            return history, trainer

        h_on, t_on = run(True, "dcache_on")
        h_off, t_off = run(False, "dcache_off")
        assert t_on._dev_cache is not None and t_on._dev_cache.hits > 0
        assert t_off._dev_cache is None
        for a, b in zip(h_on, h_off):
            assert a["train_loss"] == pytest.approx(b["train_loss"], abs=1e-7)
            assert a["val_loss"] == pytest.approx(b["val_loss"], abs=1e-7)
        for pa, pb in zip(
            jax.tree.leaves(t_on.state.params), jax.tree.leaves(t_off.state.params)
        ):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                       rtol=1e-6, atol=1e-7)

    def test_device_cache_lru_eviction(self):
        """The cache evicts least-recently-used entries past its byte
        budget and re-transfers on re-access."""
        from cinemri_tpu.train.device_cache import DeviceSampleCache

        one_mb = np.zeros((256, 1024), np.float32)  # 1 MiB
        cache = DeviceSampleCache(budget_bytes=int(2.5 * (1 << 20)))
        for key in ("a", "b", "c"):
            cache.get(key, lambda: {"x": one_mb})
        assert len(cache) == 2  # "a" evicted
        assert cache.misses == 3 and cache.hits == 0
        cache.get("c", lambda: {"x": one_mb})
        assert cache.hits == 1
        cache.get("a", lambda: {"x": one_mb})  # re-transfer
        assert cache.misses == 4

    def test_device_cache_skips_unstable_sens_maps(self, data_root, tmp_path):
        """CineNet with reference semantics (fresh per-epoch maps,
        cache_maps=False) must NOT cache sens maps — the batch falls back
        to the host placement path."""
        from cinemri_tpu.data import CineNetDataTransform

        ds = SliceDataset(
            data_root / "train",
            transform=CineNetDataTransform(
                RandomMask([6], [2]), use_seed=True, cache_maps=False
            ),
            maps_cache_dir=tmp_path / "maps_cn",
        )
        loader = Loader(ds, batch_size=1)
        cfg = TrainerConfig(epochs=1, ckpt_dir=None, log_dir=None,
                            compute_train_metrics=False)
        trainer = Trainer(
            build_model("cinenet", "XF", num_cascades=2, cg_iters=2,
                        chans=4, pools=2),
            cfg,
            train_loader=loader,
        )
        trainer.fit()
        assert trainer._dev_cache is not None
        assert trainer._dev_cache.misses == 0  # never engaged

    def test_deferred_loss_sync_matches_per_step(self, data_root, tmp_path):
        """Max-throughput mode (no per-step logging, no train metrics)
        defers the loss sync to epoch end; the recorded per-epoch train
        loss must match the per-step-synced path exactly."""
        def run(log_every):
            cfg = TrainerConfig(
                epochs=2, lr=1e-3, ckpt_dir=None, log_dir=None,
                compute_train_metrics=False, log_every_steps=log_every,
            )
            t = Trainer(
                build_model("varnet", "2D", **TINY),
                cfg,
                train_loader=_loader(data_root, "train", tmp_path),
            )
            return [h["train_loss"] for h in t.fit()]

        assert run(log_every=0) == run(log_every=1)

    def test_resume_continues_from_checkpoint(self, data_root, tmp_path):
        cfg = TrainerConfig(
            epochs=2, lr=1e-3, ckpt_dir=tmp_path / "c2", compute_train_metrics=False
        )
        t1 = Trainer(
            build_model("varnet", "2D", **TINY),
            cfg,
            train_loader=_loader(data_root, "train", tmp_path),
        )
        t1.fit()
        step_after = int(t1.state.step)

        cfg2 = TrainerConfig(
            epochs=3, lr=1e-3, ckpt_dir=tmp_path / "c2", compute_train_metrics=False
        )
        t2 = Trainer(
            build_model("varnet", "2D", **TINY),
            cfg2,
            train_loader=_loader(data_root, "train", tmp_path),
        )
        history = t2.fit(resume=True)
        # only the remaining epoch runs, starting from the saved step
        assert len(history) == 1
        assert int(t2.state.step) > step_after

    def test_resume_is_bit_identical(self, data_root, tmp_path):
        """Interrupt-and-resume must reproduce the uninterrupted run exactly:
        the checkpoint tree carries params + opt state + step + PRNG key
        (SURVEY §5), and masks are fname-seeded here, so epoch 3 of a 2+1
        resumed run replays the straight 3-epoch run bit for bit."""

        def run(ckpt_dir, epochs, resume=False):
            cfg = TrainerConfig(
                epochs=epochs, lr=1e-3, ckpt_dir=ckpt_dir,
                compute_train_metrics=False, config_fingerprint="cafe0123",
            )
            t = Trainer(
                build_model("varnet", "2D", **TINY),
                cfg,
                train_loader=_loader(data_root, "train", tmp_path),
            )
            t.fit(resume=resume)
            return t

        straight = run(tmp_path / "bit_a", 3)
        run(tmp_path / "bit_b", 2)
        resumed = run(tmp_path / "bit_b", 3, resume=True)

        leaves_a = jax.tree.leaves(straight.state.params)
        leaves_b = jax.tree.leaves(resumed.state.params)
        for a, b in zip(leaves_a, leaves_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # the restored PRNG key equals the saved one
        np.testing.assert_array_equal(
            np.asarray(straight.rng), np.asarray(resumed.rng)
        )

    def test_restore_rejects_mismatched_fingerprint(self, data_root, tmp_path):
        cfg = TrainerConfig(
            epochs=1, lr=1e-3, ckpt_dir=tmp_path / "fp",
            compute_train_metrics=False, config_fingerprint="aaaaaaaa",
        )
        t1 = Trainer(
            build_model("varnet", "2D", **TINY), cfg,
            train_loader=_loader(data_root, "train", tmp_path),
        )
        t1.fit()
        cfg2 = TrainerConfig(
            epochs=2, lr=1e-3, ckpt_dir=tmp_path / "fp",
            compute_train_metrics=False, config_fingerprint="bbbbbbbb",
        )
        t2 = Trainer(
            build_model("varnet", "2D", **TINY), cfg2,
            train_loader=_loader(data_root, "train", tmp_path),
        )
        with pytest.raises(ValueError, match="fingerprint"):
            t2.fit(resume=True)


class TestCheckpointRetention:
    def test_latest_kept_even_when_not_best(self, tmp_path):
        """Best-k retention must never delete the newest checkpoint
        (resume correctness)."""
        mgr = CheckpointManager(tmp_path / "r", max_to_keep=3, monitor="val_loss")
        tree = {"w": jnp.ones(2)}
        for step, v in enumerate([0.5, 0.1, 0.2, 0.15, 0.9]):
            mgr.save(step, tree, metrics={"val_loss": v})
        mgr.wait()
        assert mgr.latest_step == 4  # epoch 4 survives despite worst val
        assert mgr.best_step == 1
        kept = set(mgr._mgr.all_steps())
        assert 4 in kept and 1 in kept
        assert len(kept) <= 4  # 3 best + latest

    def test_best_persists_across_manager_restarts(self, tmp_path):
        mgr = CheckpointManager(tmp_path / "p", max_to_keep=2)
        tree = {"w": jnp.zeros(1)}
        mgr.save(0, tree, metrics={"val_loss": 0.3})
        mgr.save(1, tree, metrics={"val_loss": 0.8})
        mgr.wait()
        mgr2 = CheckpointManager(tmp_path / "p", max_to_keep=2)
        assert mgr2.best_step == 0


class TestPreemption:
    def test_sigterm_saves_checkpoint_for_resume(self, data_root, tmp_path):
        """SIGTERM mid-training (TPU preemption) must leave a resumable
        checkpoint (SURVEY §5: the reference has no failure handling)."""
        import signal
        import subprocess
        import sys
        import textwrap
        import time as _time

        script = textwrap.dedent(f"""
            import os
            os.environ['JAX_PLATFORMS'] = 'cpu'
            import jax; jax.config.update('jax_platforms', 'cpu')
            from cinemri_tpu.data import RandomMask, SliceDataset, VarNetDataTransform
            from cinemri_tpu.models import build_model
            from cinemri_tpu.train import Loader, Trainer, TrainerConfig

            ds = SliceDataset(
                r"{data_root}/train",
                transform=VarNetDataTransform(RandomMask([6], [2]), use_seed=True),
                maps_cache_dir=r"{tmp_path}/pmaps",
            )
            trainer = Trainer(
                build_model("varnet", "2D", num_cascades=1, sens_chans=4,
                            sens_pools=2, chans=4, pools=2),
                TrainerConfig(epochs=500, lr=1e-3, ckpt_dir=r"{tmp_path}/pckpt",
                              compute_train_metrics=False),
                train_loader=Loader(ds, batch_size=1),
            )
            print("READY", flush=True)
            trainer.fit()
        """)
        proc = subprocess.Popen(
            [sys.executable, "-c", script],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        # wait until training is underway (first epochs checkpointed);
        # generous deadline — under full-machine contention (parallel
        # compile jobs) the subprocess's first compile alone can take
        # minutes, and this test is about SIGTERM handling, not startup
        deadline = _time.time() + 480
        ckpt_dir = tmp_path / "pckpt"
        while _time.time() < deadline:
            if ckpt_dir.exists() and any(p.name.isdigit() for p in ckpt_dir.iterdir()):
                break
            if proc.poll() is not None:  # died before training — show why
                pytest.fail(f"training subprocess exited early:\n{proc.stderr.read()}")
            _time.sleep(2)
        else:
            proc.kill()
            pytest.fail("training never reached its first checkpoint")

        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=120)
        assert proc.returncode != 0  # terminated, not completed

        from cinemri_tpu.train import CheckpointManager

        mgr = CheckpointManager(ckpt_dir)
        assert mgr.latest_step is not None
        # the preemption save (step offset 1e9) exists or a normal epoch save does
        assert len(mgr._mgr.all_steps()) >= 1

    def test_overwrite_existing_step(self, tmp_path):
        """Re-saving an epoch id (post-preemption re-run) must overwrite."""
        mgr = CheckpointManager(tmp_path / "ow", max_to_keep=2)
        mgr.save(3, {"w": jnp.zeros(1)}, metrics={"val_loss": 0.9})
        mgr.save(3, {"w": jnp.ones(1)}, metrics={"val_loss": 0.1})
        mgr.wait()
        restored = mgr.restore({"w": jnp.zeros(1)}, step=3)
        np.testing.assert_array_equal(np.asarray(restored["w"]), np.ones(1))
        assert mgr.best_step == 3


class TestPaddedBatches:
    """VERDICT r1 #7: padded trailing batches must not double-weight the
    repeated sample in the loss, and eval aggregation must skip padding."""

    def test_padded_batch_loss_equals_unpadded(self, data_root, tmp_path):
        # 2 train volumes, batch_size 3 -> one batch padded with a repeat
        loader3 = _loader(data_root, "train", tmp_path, batch_size=3)
        batch = loader3.first_batch()
        assert list(batch["sample_weight"]) == [1.0, 1.0, 0.0]

        loader1 = _loader(data_root, "train", tmp_path, batch_size=2)
        batch2 = loader1.first_batch()
        assert list(batch2["sample_weight"]) == [1.0, 1.0]

        model = build_model("varnet", "XF", **TINY)
        state = create_train_state(
            model, _device_batch(batch2), make_optimizer(steps_per_epoch=1)
        )
        eval_step = make_eval_step()
        loss_padded = float(eval_step(state, _device_batch(batch))["loss"])
        loss_real = float(eval_step(state, _device_batch(batch2))["loss"])
        assert np.isclose(loss_padded, loss_real, rtol=1e-5), (
            loss_padded,
            loss_real,
        )

    def test_aggregator_skips_padding(self, rng):
        agg = MetricsAggregator()
        t, h, w = 3, 24, 24
        out = rng.random((2, t, h, w), dtype=np.float32)
        tgt = rng.random((2, t, h, w), dtype=np.float32)
        batch = {
            "fname": ["a.h5", "a.h5"],
            "slice_num": np.array([0, 0]),
            "max_value": np.array([1.0, 1.0], np.float32),
            "sample_weight": np.array([1.0, 0.0], np.float32),
        }
        agg.update_batch(batch, out, tgt)
        assert len(agg.ssim_vals["a.h5"]) == 1


class TestTorchInit:
    def test_create_train_state_applies_torch_init_by_default(
        self, data_root, tmp_path
    ):
        """Kernels must carry kaiming-uniform statistics (bounded support,
        ~uniform spread), not flax lecun_normal (VERDICT r1 missing #3)."""
        loader = _loader(data_root, "train", tmp_path)
        batch = loader.first_batch()
        model = build_model("varnet", "XF", **TINY)
        tx = make_optimizer(steps_per_epoch=1)
        s_torch = create_train_state(model, _device_batch(batch), tx)
        s_flax = create_train_state(model, _device_batch(batch), tx, torch_init=False)

        leaves = [
            (path, leaf)
            for path, leaf in jax.tree_util.tree_flatten_with_path(s_torch.params)[0]
            if getattr(path[-1], "key", None) == "kernel" and leaf.ndim >= 2
        ]
        assert leaves
        for path, leaf in leaves:
            fan_in = int(np.prod(leaf.shape[:-1]))
            bound = 1.0 / np.sqrt(fan_in)
            a = np.asarray(leaf)
            assert np.all(np.abs(a) <= bound + 1e-6), path
            # uniform, not truncated normal: spread close to bound/sqrt(3)
            if a.size > 200:
                assert np.std(a) > 0.8 * bound / np.sqrt(3), path

        # flax default produces values beyond the torch bound somewhere
        any_beyond = False
        for path, leaf in jax.tree_util.tree_flatten_with_path(s_flax.params)[0]:
            if getattr(path[-1], "key", None) == "kernel" and leaf.ndim >= 2:
                fan_in = int(np.prod(leaf.shape[:-1]))
                if np.any(np.abs(np.asarray(leaf)) > 1.0 / np.sqrt(fan_in)):
                    any_beyond = True
        assert any_beyond


def _device_batch(batch):
    from cinemri_tpu.parallel.mesh import shard_batch

    return shard_batch(batch, None)


class TestCompileCache:
    def test_enable_compile_cache_sets_config(self, tmp_path, monkeypatch):
        import jax

        from cinemri_tpu.utils.compile_cache import enable_compile_cache

        before = jax.config.jax_compilation_cache_dir
        try:
            p = enable_compile_cache(tmp_path / "cc")
            assert p.is_dir()
            assert jax.config.jax_compilation_cache_dir == str(p)
            # CINEMRI_COMPILE_CACHE=0 disables without touching config
            monkeypatch.setenv("CINEMRI_COMPILE_CACHE", "0")
            enable_compile_cache(tmp_path / "other")
            assert jax.config.jax_compilation_cache_dir == str(p)
        finally:
            jax.config.update("jax_compilation_cache_dir", before)


class TestParallelDecode:
    """Loader num_workers>1: thread-pool decode (VERDICT r2 #9)."""

    @pytest.fixture(scope="class")
    def pd_root(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("pdecode")
        return make_synthetic_dataset(
            root, splits=("train",), volumes_per_split=4, num_frames=4,
            num_coils=3, h=32, w=32,
        )

    def _ds(self, pd_root, tmp_path):
        return SliceDataset(
            pd_root / "train",
            transform=VarNetDataTransform(RandomMask([6], [2]), use_seed=False),
            maps_cache_dir=tmp_path / "pd_maps",
        )

    def test_parallel_epoch_is_deterministic(self, pd_root, tmp_path):
        mk = lambda: Loader(
            self._ds(pd_root, tmp_path), batch_size=2, shuffle=True,
            num_workers=4, prefetch_size=0,
        )
        e1 = list(mk().epoch(1))
        e2 = list(mk().epoch(1))
        assert len(e1) == len(e2) == 2
        for b1, b2 in zip(e1, e2):
            assert b1["fname"] == b2["fname"]
            np.testing.assert_array_equal(b1["mask"], b2["mask"])
            np.testing.assert_array_equal(b1["masked_kspace"], b2["masked_kspace"])
        # a different epoch draws different masks (use_seed=False semantics)
        e3 = list(mk().epoch(2))
        assert any(
            not np.array_equal(a["mask"], b["mask"]) for a, b in zip(e1, e3)
        )

    def test_parallel_matches_serial_sample_order(self, pd_root, tmp_path):
        serial = Loader(
            self._ds(pd_root, tmp_path), batch_size=2, shuffle=True, num_workers=1,
            prefetch_size=0,
        )
        parallel = Loader(
            self._ds(pd_root, tmp_path), batch_size=2, shuffle=True, num_workers=3,
            prefetch_size=0,
        )
        bs = list(serial.epoch(0))
        bp = list(parallel.epoch(0))
        assert [b["fname"] for b in bs] == [b["fname"] for b in bp]
        for a, b in zip(bs, bp):
            # same examples and targets; masks may differ (per-sample seeds
            # vs the sequential stream — both deterministic draws)
            np.testing.assert_array_equal(a["target"], b["target"])
            np.testing.assert_array_equal(a["sample_weight"], b["sample_weight"])


class TestLossWeighting:
    def test_epoch_loss_weights_by_real_samples(self):
        agg = MetricsAggregator()
        agg.add_loss(1.0, 3)   # batch of 3 real samples
        agg.add_loss(0.0, 1)   # final batch: 1 real sample
        assert agg.loss_value() == pytest.approx(0.75)
        assert agg.compute()["loss"] == pytest.approx(0.75)
