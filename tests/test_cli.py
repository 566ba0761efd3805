"""End-to-end CLI tests: train -> test -> inference through the real entry
points on a synthetic dataset (the reference's full L4 call stack)."""

import os
from pathlib import Path

import numpy as np
import pytest
import yaml

from cinemri_tpu.cli.common import build_parser, train_test_main
from cinemri_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    make_synthetic_dataset(
        root / "data",
        splits=("train", "valid", "test", "inference"),
        volumes_per_split=1,
        num_frames=4,
        num_coils=3,
        h=32,
        w=32,
    )
    cfgpath = root / "dirs_path.yaml"
    with open(cfgpath, "w") as f:
        yaml.dump(
            {
                "data_path": str(root / "data"),
                "log_path": str(root / "logs"),
                "save_path": str(root / "results"),
            },
            f,
        )
    return root


TINY_ARGS = [
    "--epochs", "1",
    "--num_cascades", "1",
    "--batch_size", "1",
    "--center_fractions", "6",
    "--accelerations", "2",
]


class TestParser:
    @pytest.mark.parametrize("family", ["varnet", "cinenet", "xpdnet"])
    def test_defaults_match_reference(self, family):
        args = build_parser(family).parse_args([])
        assert args.epochs == 150
        assert args.lr == 1e-4 and args.lr_step_size == 140 and args.lr_gamma == 0.01
        assert args.mask_type == "random"
        assert args.center_fractions == [10] and args.accelerations == [4]
        if family == "varnet":
            assert args.num_cascades == 10 and args.chans == 16 and args.pools == 3
            assert args.sens_chans == 8 and args.sens_pools == 3
        if family == "cinenet":
            assert args.num_cascades == 10 and args.CG_iters == 6
        if family == "xpdnet":
            assert args.num_cascades == 9 and args.n_primal == 5
            assert args.n_filters_per_scale == [16, 32, 64]
            assert args.primal_only is True

    def test_fingerprint_scopes_xpdnet_norm_buffers(self):
        """norm_buffers selects a different trained function on the same
        param tree, so it must scope the checkpoint dir; bf16 elsewhere is
        a pure rounding variation on the SAME function and must not."""
        from cinemri_tpu.cli.common import config_fingerprint

        fp = lambda fam, argv: config_fingerprint(
            fam, build_parser(fam).parse_args(argv)
        )
        assert fp("xpdnet", []) != fp("xpdnet", ["--bf16", "1"])  # auto-on
        assert fp("xpdnet", ["--bf16", "1"]) == fp("xpdnet", ["--norm_buffers", "1"])
        crnn = ["--dynamic_type", "CRNN"]
        assert fp("xpdnet", crnn) == fp("xpdnet", crnn + ["--bf16", "1"])
        assert fp("varnet", []) == fp("varnet", ["--bf16", "1"])
        # norm_buffers OFF (explicit or resolved) is byte-identical behavior
        # to the pre-flag code, so it must not scope
        assert fp("xpdnet", []) == fp("xpdnet", ["--norm_buffers", "0"])

    def test_fingerprint_backcompat_prenorm_checkpoints(self):
        """An f32 xpdnet checkpoint trained before --norm_buffers existed
        must still resolve to the same directory: the fingerprint source
        for resolved-off runs is exactly the pre-flag key list."""
        import hashlib

        from cinemri_tpu.cli.common import MODEL_DEFAULTS, config_fingerprint

        args = build_parser("xpdnet").parse_args([])
        keys = sorted(MODEL_DEFAULTS["xpdnet"]) + [
            "dynamic_type", "weight_sharing", "compress_coils",
        ]
        legacy_src = [(k, getattr(args, k)) for k in keys]
        legacy = hashlib.sha1(repr(legacy_src).encode()).hexdigest()[:8]
        assert config_fingerprint("xpdnet", args) == legacy


class TestTrainTestFlow:
    def test_varnet_train_then_test_with_inference(self, workdir):
        common = TINY_ARGS + [
            "--path_config", str(workdir / "dirs_path.yaml"),
            "--maps_cache_dir", str(workdir / "maps"),
            "--chans", "4",
            "--sens_chans", "4", "--sens_pools", "2", "--pools", "2",
            "--dynamic_type", "XF",
        ]
        out = train_test_main("varnet", common + ["--mode", "train", "--save_checkpoint", "1"])
        assert len(out["history"]) == 1
        assert np.isfinite(out["history"][0]["train_loss"])

        out = train_test_main(
            "varnet", common + ["--mode", "test", "--load_model", "1", "--inference", "1"]
        )
        m = out["test_metrics"]
        assert set(m) >= {"nmse", "ssim", "psnr", "loss"}
        assert 0 < m["ssim"] <= 1
        # SSIMs.csv artifact + .npy artifact set
        assert (workdir / "results" / "SSIMs.csv").exists()
        npys = list((workdir / "results").glob("*.npy"))
        kinds = {p.name.split("_")[0] for p in npys}
        assert {"target", "output", "zero"} <= kinds
        assert out["inference_seconds"] > 0

    def test_checkpoints_scoped_per_config(self, workdir):
        """Training a second dynamic_type into the same log root must save
        and restore its own checkpoints (regression: a shared Orbax step
        dir silently skipped saves at lower step numbers, then crashed the
        restore with a mismatched tree). Mirrors the reference's stamped
        checkpoint filenames (train_test_varnet.py:270-277)."""
        common = TINY_ARGS + [
            "--path_config", str(workdir / "dirs_path.yaml"),
            "--maps_cache_dir", str(workdir / "maps"),
            "--chans", "4",
            "--sens_chans", "4", "--sens_pools", "2", "--pools", "2",
            "--dynamic_type", "2D",
        ]
        # test_varnet_train_then_test_with_inference already trained XF into
        # this log root at a higher epoch count than this 1-epoch run
        train_test_main("varnet", common + ["--mode", "train", "--save_checkpoint", "1"])
        ckpt_root = workdir / "logs" / "varnet" / "varnet_logs" / "checkpoints"
        # dir name = family_dynamic_acc + model-config fingerprint hash
        assert list(ckpt_root.glob("varnet_2D_acc2_*"))
        out = train_test_main("varnet", common + ["--mode", "test", "--load_model", "1"])
        assert 0 < out["test_metrics"]["ssim"] <= 1

    def test_cinenet_smoke(self, workdir):
        out = train_test_main(
            "cinenet",
            TINY_ARGS
            + [
                "--path_config", str(workdir / "dirs_path.yaml"),
                "--maps_cache_dir", str(workdir / "maps"),
                "--chans", "4", "--pools", "2", "--CG_iters", "2",
                "--dynamic_type", "2D",
                "--mode", "train",
            ],
        )
        assert np.isfinite(out["history"][0]["train_loss"])

    def test_xpdnet_smoke(self, workdir):
        out = train_test_main(
            "xpdnet",
            TINY_ARGS
            + [
                "--path_config", str(workdir / "dirs_path.yaml"),
                "--maps_cache_dir", str(workdir / "maps"),
                "--sens_chans", "4", "--sens_pools", "2",
                "--n_scales", "2", "--first_conv_n_filters", "4",
                "--n_filters_per_scale", "4", "8",
                "--n_primal", "2",
                "--dynamic_type", "XF",
                "--mode", "train",
            ],
        )
        assert np.isfinite(out["history"][0]["train_loss"])


class TestVisualize:
    def test_visualize_renders_artifact_figures(self, tmp_path, rng):
        from cinemri_tpu.cli.visualize import main as viz_main

        t, h, w = 4, 24, 24
        tgt = rng.random((t, h, w)).astype(np.float32)
        np.save(tmp_path / "target_vol0.h5.npy", tgt)
        np.save(tmp_path / "output_varnet_vol0.h5.npy", tgt * 0.9)
        np.save(tmp_path / "zero_filled_vol0.h5.npy", tgt * 0.5)
        written = viz_main(["--save_path", str(tmp_path)])
        assert len(written) == 1
        assert written[0].exists() and written[0].stat().st_size > 0


class TestLongClip:
    def test_chunked_reconstruction_stitches_frames(self, rng):
        """Long-clip chunking (notebook cell 0/2 workflow): chunk outputs
        must tile the full clip, and a linear 'model' must reproduce the
        unchunked result exactly."""
        from cinemri_tpu.cli.inference import reconstruct_long_clip

        t, c, h, w = 11, 2, 8, 8
        k = (rng.standard_normal((1, t, c, h, w)) + 1j * rng.standard_normal((1, t, c, h, w))).astype(np.complex64)
        mask = np.ones((1, 1, 1, h, 1), np.float32)

        # frame-local surrogate model: per-frame RSS (chunking must be exact)
        fwd = lambda kk, mm: np.sqrt((np.abs(kk) ** 2).sum(axis=2))
        full = fwd(k, mask)
        chunked = reconstruct_long_clip(fwd, k, mask, chunk_frames=4)
        assert chunked.shape == (1, t, h, w)
        np.testing.assert_allclose(chunked, full, rtol=1e-6)

    def test_short_clip_passthrough(self, rng):
        from cinemri_tpu.cli.inference import reconstruct_long_clip

        k = (rng.standard_normal((1, 3, 2, 8, 8)) + 1j * rng.standard_normal((1, 3, 2, 8, 8))).astype(np.complex64)
        mask = np.ones((1, 1, 1, 8, 1), np.float32)
        calls = []
        fwd = lambda kk, mm: (calls.append(1), np.abs(kk).sum(axis=2))[1]
        out = reconstruct_long_clip(fwd, k, mask, chunk_frames=15)
        assert len(calls) == 1 and out.shape == (1, 3, 8, 8)


class TestDistributedCLI:
    """VERDICT r1 #2: data-parallel training must be reachable from the CLI.

    SPMD invariance: `--num_devices 8 --batch_size 1` (global batch 8
    sharded over the virtual 8-device mesh) must produce the same metrics
    as `--num_devices 1 --batch_size 8` (same global batch, one device) —
    same data order, same masks, same init; only the sharding differs.
    """

    @pytest.fixture(scope="class")
    def workdir8(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("cli8")
        make_synthetic_dataset(
            root / "data",
            splits=("train", "valid", "test"),
            volumes_per_split=8,
            num_frames=3,
            num_coils=2,
            h=24,
            w=24,
        )
        return root

    def _run(self, workdir8, tag, extra):
        import yaml as _yaml

        cfg = workdir8 / f"dirs_{tag}.yaml"
        with open(cfg, "w") as f:
            _yaml.dump(
                {
                    "data_path": str(workdir8 / "data"),
                    "log_path": str(workdir8 / f"logs_{tag}"),
                    "save_path": str(workdir8 / f"results_{tag}"),
                },
                f,
            )
        args = [
            "--mode", "train",
            "--epochs", "1",
            "--num_cascades", "1",
            "--chans", "4", "--pools", "2",
            "--sens_chans", "4", "--sens_pools", "2",
            "--center_fractions", "4",
            "--accelerations", "2",
            "--path_config", str(cfg),
            "--maps_cache_dir", str(workdir8 / "maps"),
            "--num_workers", "0",
        ] + extra
        return train_test_main("varnet", args)

    def test_mesh_train_matches_single_device(self, workdir8):
        out_mesh = self._run(
            workdir8, "mesh", ["--num_devices", "8", "--batch_size", "1"]
        )
        out_single = self._run(
            workdir8, "single", ["--num_devices", "1", "--batch_size", "8"]
        )
        m, s = out_mesh["history"][0], out_single["history"][0]
        for key in ("train_loss", "val_ssim", "val_nmse", "val_loss"):
            assert np.isclose(m[key], s[key], rtol=1e-4, atol=1e-6), (
                key,
                m[key],
                s[key],
            )

    def test_num_devices_exceeding_visible_raises(self, workdir8):
        with pytest.raises(ValueError, match="devices visible"):
            self._run(workdir8, "toobig", ["--num_devices", "99"])

    def test_coil_devices_2d_mesh_train(self, workdir8):
        """--coil_devices composes with --num_devices on a 2-D data x coil
        mesh: the 2-coil synthetic volumes shard over the coil axis. The
        pre-update epoch-0 training loss must match the single-device run
        exactly (same data, masks, init); post-update val metrics are
        compared loosely — the coil all-reduce's different summation order
        flips signs of near-zero gradient entries, which first-step Adam
        amplifies to ~lr-sized param deltas (see
        tests/test_parallel.py::TestCoilParallel for strict gradient-level
        equivalence)."""
        out_tp = self._run(
            workdir8, "coiltp",
            ["--num_devices", "2", "--coil_devices", "2", "--batch_size", "4"],
        )
        out_single = self._run(
            workdir8, "coilsingle", ["--num_devices", "1", "--batch_size", "8"]
        )
        m, s = out_tp["history"][0], out_single["history"][0]
        assert np.isclose(m["train_loss"], s["train_loss"], rtol=1e-4, atol=1e-6)
        for key in ("val_ssim", "val_nmse", "val_loss"):
            assert np.isclose(m[key], s[key], rtol=5e-3, atol=1e-4), (
                key, m[key], s[key],
            )

    def test_plane_devices_train(self, workdir8):
        """--plane_devices shards the XF rotated-plane batches over a
        data x plane mesh through the CLI; metrics match a single-device
        run of the same global batch."""
        out_sp = self._run(
            workdir8, "planesp",
            ["--num_devices", "2", "--plane_devices", "2", "--batch_size", "4"],
        )
        out_single = self._run(
            workdir8, "planesingle", ["--num_devices", "1", "--batch_size", "8"]
        )
        m, s = out_sp["history"][0], out_single["history"][0]
        assert np.isclose(m["train_loss"], s["train_loss"], rtol=1e-4, atol=1e-6)
        for key in ("val_ssim", "val_nmse", "val_loss"):
            assert np.isclose(m[key], s[key], rtol=5e-3, atol=1e-4), (
                key, m[key], s[key],
            )

    def test_plane_devices_rejects_non_plane_variants(self, workdir8):
        with pytest.raises(ValueError, match="rotated-plane"):
            self._run(
                workdir8, "plane2d",
                ["--plane_devices", "2", "--dynamic_type", "2D"],
            )


class TestExportMode:
    def test_export_writes_loadable_artifact(self, workdir):
        """--mode export writes a StableHLO artifact the serving loader can
        run without the model code (beyond-reference deployment path)."""
        from cinemri_tpu.serve import load_exported

        common = TINY_ARGS + [
            "--path_config", str(workdir / "dirs_path.yaml"),
            "--maps_cache_dir", str(workdir / "maps"),
            "--chans", "4",
            "--sens_chans", "4", "--sens_pools", "2", "--pools", "2",
            "--dynamic_type", "XF",
        ]
        out = train_test_main(
            "varnet", common + ["--mode", "export", "--load_model", "1"]
        )
        path = Path(out["export_path"])
        assert path.exists() and path.stat().st_size > 1000

        fn = load_exported(path)
        import numpy as np
        from cinemri_tpu.data import RandomMask, SliceDataset, VarNetDataTransform
        import yaml
        cfg = yaml.safe_load(open(workdir / "dirs_path.yaml"))
        ds = SliceDataset(
            Path(cfg["data_path"]) / "test",
            transform=VarNetDataTransform(RandomMask([6], [2]), use_seed=True),
            maps_cache_dir=workdir / "maps",
        )
        s = ds[0]
        k = s["masked_kspace"][None]
        m = s["mask"][None].astype(np.float32)
        img = np.asarray(fn(k.real, k.imag, m))
        assert img.shape[0] == 1 and np.isfinite(img).all()


class TestDataArgs:
    def test_combine_train_val_and_sample_rate(self, workdir):
        """--combine_train_val merges the train+valid file lists
        (data_module.py:156-176); sample_rate=1.0 keeps the single
        volume-per-split fixture non-empty (the reference rounds
        len*sample_rate, so 0.5 of 1 example is 0 — same semantics here).
        The run must still train end to end."""
        out = train_test_main(
            "varnet",
            TINY_ARGS
            + [
                "--path_config", str(workdir / "dirs_path.yaml"),
                "--maps_cache_dir", str(workdir / "maps"),
                "--chans", "4",
                "--sens_chans", "4", "--sens_pools", "2", "--pools", "2",
                "--dynamic_type", "XF",
                "--combine_train_val", "1",
                "--sample_rate", "1.0",
                "--mode", "train",
            ],
        )
        assert np.isfinite(out["history"][0]["train_loss"])


class TestKernelDCFlag:
    @pytest.mark.parametrize("family", ["varnet", "cinenet", "xpdnet"])
    def test_kernel_dc_plumbs_to_models(self, family):
        """--kernel_dc toggles the collapsed-DC path on every model class
        (default on; 0 restores the reference's k-space formulation)."""
        from cinemri_tpu.cli.common import _build_model_from_args

        for dyn in ("XF", "CRNN"):
            a = build_parser(family).parse_args(
                ["--dynamic_type", dyn, "--kernel_dc", "0"]
            )
            assert _build_model_from_args(family, a).kernel_dc is False
            a = build_parser(family).parse_args(["--dynamic_type", dyn])
            assert _build_model_from_args(family, a).kernel_dc is True


class TestCineNetExportMode:
    def test_cinenet_export_includes_sens_signature(self, workdir):
        """CineNet export bakes the (k, mask, sens) signature artifact."""
        from cinemri_tpu.serve import load_exported

        common = TINY_ARGS + [
            "--path_config", str(workdir / "dirs_path.yaml"),
            "--maps_cache_dir", str(workdir / "maps"),
            "--chans", "4", "--pools", "2", "--CG_iters", "2",
            "--dynamic_type", "2D",
        ]
        # train once so a checkpoint exists, then export best
        train_test_main("cinenet", common + ["--mode", "train", "--save_checkpoint", "1"])
        out = train_test_main("cinenet", common + ["--mode", "export", "--load_model", "1"])
        path = Path(out["export_path"])
        assert path.exists()
        fn = load_exported(path)  # callable with 5 float-array args
        assert callable(fn)


class TestCoilCompressionCLI:
    def test_train_and_test_with_virtual_coils(self, workdir):
        """--compress_coils 2 on 3 physical coils: the full train/test flow
        runs on virtual coils and produces sane metrics — and warns that
        compression is outside the parity envelope."""
        common = TINY_ARGS + [
            "--path_config", str(workdir / "dirs_path.yaml"),
            "--maps_cache_dir", str(workdir / "maps"),
            "--chans", "4",
            "--sens_chans", "4", "--sens_pools", "2", "--pools", "2",
            "--dynamic_type", "XF",
            "--compress_coils", "2",
        ]
        with pytest.warns(UserWarning, match="outside the parity envelope"):
            out = train_test_main(
                "varnet", common + ["--mode", "train", "--save_checkpoint", "1"]
            )
        assert np.isfinite(out["history"][0]["train_loss"])
        with pytest.warns(UserWarning, match="compress_coils"):
            out = train_test_main(
                "varnet",
                common + ["--mode", "test", "--load_model", "1", "--inference", "0"],
            )
        m = out["test_metrics"]
        assert 0 < m["ssim"] <= 1


class TestEnvelopeNotices:
    """Runtime notices when a run leaves the certified parity envelope
    (PARITY.md) — the reference's own assert-and-warn habit
    (varnet_module.py:71-72) applied to this framework's extended modes."""

    def test_batch_size_above_one_warns(self, workdir):
        args = TINY_ARGS + [
            "--path_config", str(workdir / "dirs_path.yaml"),
            "--maps_cache_dir", str(workdir / "maps"),
            "--chans", "4",
            "--sens_chans", "4", "--sens_pools", "2", "--pools", "2",
            "--mode", "train",
        ]
        args[args.index("--batch_size") + 1] = "2"
        with pytest.warns(UserWarning, match="data_range per-sample"):
            out = train_test_main("varnet", args)
        assert np.isfinite(out["history"][0]["train_loss"])

    def test_dp_default_lr_warns_and_scaled_lr_does_not(self, workdir):
        """--num_devices N at the default lr warns that the certified
        data-parallel recipe scales lr linearly (BASELINE.md round-5 DP
        certification); passing the scaled lr silences the notice."""
        args = TINY_ARGS + [
            "--path_config", str(workdir / "dirs_path.yaml"),
            "--maps_cache_dir", str(workdir / "maps"),
            "--chans", "4",
            "--sens_chans", "4", "--sens_pools", "2", "--pools", "2",
            "--mode", "train",
            "--num_devices", "2",
        ]
        with pytest.warns(UserWarning, match="scales lr LINEARLY"):
            out = train_test_main("varnet", args)
        assert np.isfinite(out["history"][0]["train_loss"])

        import warnings as _w

        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            train_test_main("varnet", args + ["--lr", "2e-4"])
        assert not [w for w in rec if "LINEARLY" in str(w.message)]

    def test_bf16_uncertified_dynamic_type_warns(self, workdir):
        """--bf16 training on a dynamic type without a trained-quality
        head-to-head row (cli.common.BF16_CERTIFIED) warns; a certified
        pairing (varnet-XF) stays silent on that notice."""
        args = TINY_ARGS + [
            "--path_config", str(workdir / "dirs_path.yaml"),
            "--maps_cache_dir", str(workdir / "maps"),
            "--chans", "4",
            "--sens_chans", "4", "--sens_pools", "2", "--pools", "2",
            "--mode", "train",
            "--bf16", "1",
            "--dynamic_type", "2D",
        ]
        with pytest.warns(UserWarning, match="no head-to-head"):
            out = train_test_main("varnet", args)
        assert np.isfinite(out["history"][0]["train_loss"])

        import warnings as _w

        args[args.index("--dynamic_type") + 1] = "XF"
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            train_test_main("varnet", args)
        assert not [w for w in rec if "no head-to-head" in str(w.message)]

    def test_xpdnet_norm_buffers_override_warns(self, workdir):
        """Forcing --norm_buffers against its certified pairing (on exactly
        under --bf16) is a function change and warns at configuration
        time; the auto default stays silent (see
        test_certified_configuration_does_not_warn)."""
        args = TINY_ARGS + [
            "--path_config", str(workdir / "dirs_path.yaml"),
            "--maps_cache_dir", str(workdir / "maps"),
            "--sens_chans", "4", "--sens_pools", "2",
            "--n_scales", "2", "--first_conv_n_filters", "4",
            "--n_filters_per_scale", "4", "8",
            "--n_primal", "2",
            "--dynamic_type", "XF",
            "--mode", "train",
            "--norm_buffers", "1",
        ]
        with pytest.warns(UserWarning, match="certified pairing"):
            out = train_test_main("xpdnet", args)
        assert np.isfinite(out["history"][0]["train_loss"])

    def test_profile_steps_writes_trace(self, workdir, tmp_path):
        """--profile_steps N captures an xplane trace of post-compile
        training steps into --profile_dir."""
        args = TINY_ARGS + [
            "--path_config", str(workdir / "dirs_path.yaml"),
            "--maps_cache_dir", str(workdir / "maps"),
            "--chans", "4",
            "--sens_chans", "4", "--sens_pools", "2", "--pools", "2",
            "--mode", "train",
            "--epochs", "2",  # step 0 carries the compile; step 1 is traced
            "--profile_steps", "1",
            "--profile_dir", str(tmp_path / "prof"),
        ]
        out = train_test_main("varnet", args)
        assert np.isfinite(out["history"][-1]["train_loss"])
        assert any((tmp_path / "prof").rglob("*.xplane.pb"))

    def test_profile_steps_warns_outside_train_mode(self, workdir):
        """--profile_steps only instruments Trainer.fit; --mode test must
        say so instead of silently writing no trace."""
        args = TINY_ARGS + [
            "--path_config", str(workdir / "dirs_path.yaml"),
            "--maps_cache_dir", str(workdir / "maps"),
            "--chans", "4",
            "--sens_chans", "4", "--sens_pools", "2", "--pools", "2",
            "--mode", "test",  # fresh-init eval; no checkpoint needed
            "--profile_steps", "5",
        ]
        with pytest.warns(UserWarning, match="only traces training steps"):
            train_test_main("varnet", args)

    def test_profile_steps_negative_is_off(self, workdir, tmp_path):
        """A negative --profile_steps clamps to off instead of tracing the
        whole run."""
        args = TINY_ARGS + [
            "--path_config", str(workdir / "dirs_path.yaml"),
            "--maps_cache_dir", str(workdir / "maps"),
            "--chans", "4",
            "--sens_chans", "4", "--sens_pools", "2", "--pools", "2",
            "--mode", "train", "--epochs", "2",
            "--profile_steps", "-5",
            "--profile_dir", str(tmp_path / "noprof"),
        ]
        out = train_test_main("varnet", args)
        assert np.isfinite(out["history"][-1]["train_loss"])
        assert not (tmp_path / "noprof").exists()

    def test_xpdnet_norm_buffers_crnn_warns_ignored(self, workdir):
        """--norm_buffers with --dynamic_type CRNN is a no-op (XPDNetRNN
        has no MWCNN buffer path); the flag must not vanish silently."""
        args = TINY_ARGS + [
            "--path_config", str(workdir / "dirs_path.yaml"),
            "--maps_cache_dir", str(workdir / "maps"),
            "--sens_chans", "4", "--sens_pools", "2",
            "--crnn_chans", "4", "--n_primal", "2",
            "--dynamic_type", "CRNN",
            "--mode", "train",
            "--norm_buffers", "1",
        ]
        with pytest.warns(UserWarning, match="no effect for --dynamic_type CRNN"):
            out = train_test_main("xpdnet", args)
        assert np.isfinite(out["history"][0]["train_loss"])

    def test_certified_configuration_does_not_warn(self, workdir, recwarn):
        """The shipping defaults (batch 1, no compression, f32) run without
        envelope notices."""
        import warnings

        args = TINY_ARGS + [
            "--path_config", str(workdir / "dirs_path.yaml"),
            "--maps_cache_dir", str(workdir / "maps"),
            "--chans", "4",
            "--sens_chans", "4", "--sens_pools", "2", "--pools", "2",
            "--mode", "train",
        ]
        with warnings.catch_warnings():
            warnings.simplefilter("error", UserWarning)
            train_test_main("varnet", args)
