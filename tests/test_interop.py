"""Checkpoint import (cinemri_tpu.interop): reference Lightning .ckpt files
-> this framework's parameter trees.

Validates the state-dict path against the live-module port used by the
parity tests (both must produce identical trees) and end-to-end against the
reference forward itself.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from cinemri_tpu.interop import (
    build_kwargs_from_hparams,
    check_tree_matches,
    import_torch_checkpoint,
)
from cinemri_tpu.models import build_model
from cinemri_tpu.ops.cplx import from_complex

from . import _torch_ref as tr
from .test_reference_parity import _cpu_cuda

REF = tr.load_reference()


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _crandn(rng, *shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        np.complex64
    )


def _mask(rng, t, h, center=6):
    m = np.zeros((t, 1, h, 1), np.float32)
    m[:, :, h // 2 - center // 2 : h // 2 + center // 2] = 1
    for ti in range(t):
        m[ti, 0, rng.choice(h, size=h // 3, replace=False), 0] = 1
    return m[None]


def _save_ckpt(tmp_path, module, prefix, hparams):
    """Write a Lightning-style checkpoint dict like trainer.save_checkpoint
    (train_test_varnet.py:107-109)."""
    sd = {f"{prefix}.{k}": v for k, v in module.state_dict().items()}
    path = tmp_path / f"{prefix}.ckpt"
    torch.save({"state_dict": sd, "hyper_parameters": hparams}, path)
    return path


def _trees_equal(a, b):
    fa, ta = jax.tree_util.tree_flatten(a)
    fb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb, f"tree structures differ:\n{ta}\nvs\n{tb}"
    for xa, xb in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


class TestVarNetImport:
    def test_ckpt_matches_module_port_and_forward(self, rng, tmp_path):
        tvn = REF.varnet.VarNet(
            num_cascades=2, sens_chans=4, sens_pools=2, chans=4, pools=2,
            dynamic_type="XF",
        ).eval()
        hp = {
            "num_cascades": 2, "sens_chans": 4, "sens_pools": 2, "chans": 4,
            "pools": 2, "dynamic_type": "XF", "weight_sharing": False,
            "lr": 1e-4,
        }
        path = _save_ckpt(tmp_path, tvn, "varnet", hp)

        variables, kwargs, family, dyn = import_torch_checkpoint(path)
        assert (family, dyn) == ("varnet", "XF")
        assert kwargs == {
            "num_cascades": 2, "sens_chans": 4, "sens_pools": 2, "chans": 4,
            "pools": 2, "weight_sharing": False,
        }

        # identical to the live-module port used by the parity tests
        want = {
            "params": {
                "sens_net": tr.sens_model_params(tvn.sens_net),
                "cascades": {
                    "net_xf": tr.norm_unet_params(tvn.model[0]),
                    "net_yf": tr.norm_unet_params(tvn.model[1]),
                },
                "lambda_reg": np.asarray(
                    [blk.lambda_reg.detach().numpy()[0] for blk in tvn.cascades],
                    np.float32,
                ),
            }
        }
        _trees_equal(variables, want)

        # and the imported model reproduces the reference forward
        k = _crandn(rng, 1, 4, 3, 24, 20)
        mask = _mask(rng, 4, 24)
        masked = k * mask
        with torch.no_grad():
            ref_out = tvn(
                tr.to_torch_complex6(masked), tr.mask_to_torch(mask)
            ).numpy()
        model = build_model("varnet", dyn, kernel_dc=False, **kwargs)
        got = np.asarray(
            model.apply(variables, from_complex(masked), jnp.asarray(mask))
        )
        np.testing.assert_allclose(got, ref_out, rtol=5e-3, atol=5e-4)

        # structure check passes against a fresh init of the same config
        init = jax.jit(model.init)(
            jax.random.PRNGKey(0), from_complex(masked), jnp.asarray(mask)
        )
        check_tree_matches(variables, init)

    def test_crnn_autodetected(self, tmp_path):
        with _cpu_cuda():
            tvr = REF.recurrent_varnet.VarNet_RNN(
                num_cascades=2, sens_chans=4, sens_pools=2, chans=6
            ).eval()
        hp = {"num_cascades": 2, "sens_chans": 4, "sens_pools": 2, "chans": 6,
              "dynamic_type": "CRNN"}
        path = _save_ckpt(tmp_path, tvr, "varnet", hp)
        variables, kwargs, family, dyn = import_torch_checkpoint(path)
        assert (family, dyn) == ("varnet", "CRNN")
        want = {
            "params": {
                "sens_net": tr.sens_model_params(tvr.sens_net),
                "iterations": {
                    "trunk": tr.crnn_trunk_params(tvr),
                    "lambda_reg": np.float32(tvr.lambda_reg.detach().numpy()[0]),
                },
            }
        }
        _trees_equal(variables, want)
        assert kwargs == {"num_cascades": 2, "sens_chans": 4, "sens_pools": 2,
                          "chans": 6}


class TestCineNetImport:
    def test_ckpt_roundtrip(self, rng, tmp_path):
        tcn = REF.cinenet.CineNet(
            num_cascades=2, CG_iters=3, chans=4, pools=2, dynamic_type="XF"
        ).eval()
        hp = {"num_cascades": 2, "CG_iters": 3, "chans": 4, "pools": 2,
              "dynamic_type": "XF", "weight_sharing": False}
        path = _save_ckpt(tmp_path, tcn, "cinenet", hp)
        variables, kwargs, family, dyn = import_torch_checkpoint(path)
        assert (family, dyn) == ("cinenet", "XF")
        assert kwargs["cg_iters"] == 3

        k = _crandn(rng, 1, 4, 3, 24, 20)
        mask = _mask(rng, 4, 24)
        masked = k * mask
        sens = _crandn(rng, 1, 1, 3, 24, 20)
        sens /= np.sqrt((np.abs(sens) ** 2).sum(2, keepdims=True))
        with torch.no_grad():
            ref_out = tcn(
                tr.to_torch_complex6(masked),
                tr.mask_to_torch(mask).float(),
                tr.to_torch_complex6(sens),
            ).numpy()
        model = build_model("cinenet", dyn, **kwargs)
        got = np.asarray(
            model.apply(
                variables, from_complex(masked), jnp.asarray(mask),
                from_complex(sens),
            )
        )
        np.testing.assert_allclose(got, ref_out, rtol=5e-3, atol=5e-4)

    def test_2d_single_net(self, tmp_path):
        tcn = REF.cinenet.CineNet(
            num_cascades=2, CG_iters=2, chans=4, pools=2, dynamic_type="2D"
        ).eval()
        hp = {"num_cascades": 2, "CG_iters": 2, "chans": 4, "pools": 2,
              "dynamic_type": "2D"}
        path = _save_ckpt(tmp_path, tcn, "cinenet", hp)
        variables, _, _, dyn = import_torch_checkpoint(path)
        assert dyn == "2D"
        assert set(variables["params"]["cascades"]) == {"net"}


class TestXPDNetImport:
    def test_pair_nets_and_stacking(self, rng, tmp_path):
        with _cpu_cuda():
            txp = REF.xpdnet.XPDNet(
                num_cascades=2, sens_chans=4, sens_pools=2, n_scales=2,
                n_filters_per_scale=[4, 8], n_convs_per_scale=[2, 2],
                n_first_convs=1, first_conv_n_filters=6, n_primal=3,
                dynamic_type="XF",
            ).eval()
        hp = {
            "num_cascades": 2, "sens_chans": 4, "sens_pools": 2, "n_scales": 2,
            "n_filters_per_scale": [4, 8], "n_convs_per_scale": [2, 2],
            "n_first_convs": 1, "first_conv_n_filters": 6, "n_primal": 3,
            "primal_only": True, "n_dual": 1, "res": False,
            "dynamic_type": "XF", "weight_sharing": False,
        }
        path = _save_ckpt(tmp_path, txp, "xpdnet", hp)
        variables, kwargs, family, dyn = import_torch_checkpoint(path)
        assert (family, dyn) == ("xpdnet", "XF")
        assert kwargs["n_filters_per_scale"] == (4, 8)  # list -> tuple

        # stacked per-cascade params equal the parity tests' stacking
        per_cascade = [
            {
                "image_net_xf": tr.mwcnn_params(txp.image_net[i][0]),
                "image_net_yf": tr.mwcnn_params(txp.image_net[i][1]),
            }
            for i in range(2)
        ]
        want = {
            "params": {
                "sens_net": {"Unet_0": tr.unet_params(txp.sens_net.unet_model)},
                "cascades": jax.tree.map(lambda *xs: np.stack(xs), *per_cascade),
            }
        }
        _trees_equal(variables, want)

        k = _crandn(rng, 1, 4, 3, 24, 20)
        mask = _mask(rng, 4, 24)
        masked = k * mask
        with _cpu_cuda(), torch.no_grad():
            ref_out = txp(
                tr.to_torch_complex6(masked), tr.mask_to_torch(mask)
            ).numpy()
        model = build_model("xpdnet", dyn, kernel_dc=False, **kwargs)
        got = np.asarray(
            model.apply(variables, from_complex(masked), jnp.asarray(mask))
        )
        np.testing.assert_allclose(got, ref_out, rtol=5e-3, atol=5e-4)

    def test_dual_buffer_kspace_net(self, tmp_path):
        with _cpu_cuda():
            txp = REF.xpdnet.XPDNet(
                num_cascades=2, sens_chans=4, sens_pools=2, n_scales=2,
                n_filters_per_scale=[4, 8], n_convs_per_scale=[2, 2],
                n_first_convs=1, first_conv_n_filters=6, n_primal=3,
                primal_only=False, n_dual=2, dynamic_type="XF",
            ).eval()
        path = _save_ckpt(tmp_path, txp, "xpdnet", {"dynamic_type": "XF"})
        variables, _, _, _ = import_torch_checkpoint(path)
        cas = variables["params"]["cascades"]
        assert "kspace_net" in cas
        assert cas["kspace_net"]["Conv_0"]["kernel"].shape[0] == 2  # stacked


class TestErrorHandling:
    def test_family_mismatch_raises(self, tmp_path):
        tcn = REF.cinenet.CineNet(
            num_cascades=1, CG_iters=1, chans=4, pools=2, dynamic_type="2D"
        )
        path = _save_ckpt(tmp_path, tcn, "cinenet", {})
        with pytest.raises(ValueError, match="cinenet"):
            import_torch_checkpoint(path, family="varnet")

    def test_unknown_prefix_needs_family(self, tmp_path):
        path = tmp_path / "bare.ckpt"
        torch.save({"something.weight": torch.zeros(3)}, path)
        with pytest.raises(ValueError, match="cannot detect"):
            import_torch_checkpoint(path)

    def test_check_tree_matches_reports_shape_diff(self):
        a = {"params": {"w": np.zeros((2, 3))}}
        b = {"params": {"w": np.zeros((2, 4))}}
        with pytest.raises(ValueError, match="shape mismatches"):
            check_tree_matches(a, b)
        check_tree_matches(a, {"params": {"w": np.ones((2, 3))}})  # ok

    def test_bare_state_dict_with_family(self, tmp_path):
        """A raw model.state_dict() (no Lightning wrapper, no prefix) imports
        when the family is given explicitly."""
        tcn = REF.cinenet.CineNet(
            num_cascades=1, CG_iters=1, chans=4, pools=2, dynamic_type="2D"
        )
        path = tmp_path / "bare.ckpt"
        torch.save(tcn.state_dict(), path)
        variables, kwargs, family, dyn = import_torch_checkpoint(
            path, family="cinenet", dynamic_type="2D"
        )
        assert family == "cinenet" and dyn == "2D"
        assert set(variables["params"]["cascades"]) == {"net"}
        assert kwargs == {}  # no hparams stored in a bare state dict


class TestCLITorchCkpt:
    def test_mode_test_with_from_torch_ckpt(self, tmp_path):
        """--from_torch_ckpt end-to-end: evaluate a reference checkpoint's
        weights through the CLI without any Orbax checkpoint present."""
        import yaml

        from cinemri_tpu.cli.common import train_test_main
        from cinemri_tpu.data.synthetic import make_synthetic_dataset

        make_synthetic_dataset(
            tmp_path / "data",
            splits=("train", "valid", "test"),
            volumes_per_split=1,
            num_frames=4,
            num_coils=3,
            h=32,
            w=32,
        )
        with open(tmp_path / "dirs_path.yaml", "w") as f:
            yaml.dump(
                {
                    "data_path": str(tmp_path / "data"),
                    "log_path": str(tmp_path / "logs"),
                    "save_path": str(tmp_path / "results"),
                },
                f,
            )

        tvn = REF.varnet.VarNet(
            num_cascades=1, sens_chans=4, sens_pools=2, chans=4, pools=2,
            dynamic_type="XF",
        )
        hp = {"num_cascades": 1, "sens_chans": 4, "sens_pools": 2, "chans": 4,
              "pools": 2, "dynamic_type": "XF", "weight_sharing": False}
        ckpt = _save_ckpt(tmp_path, tvn, "varnet", hp)

        out = train_test_main(
            "varnet",
            [
                "--mode", "test", "--inference", "0",
                "--from_torch_ckpt", str(ckpt),
                "--path_config", str(tmp_path / "dirs_path.yaml"),
                "--num_cascades", "1", "--chans", "4",
                "--sens_chans", "4", "--sens_pools", "2", "--pools", "2",
                "--dynamic_type", "XF",
                "--center_fractions", "6", "--accelerations", "2",
            ],
        )
        assert np.isfinite(out["test_metrics"]["ssim"])
        # and the loaded params are the checkpoint's, not a random init
        got = out["trainer"].state.params["params"]["lambda_reg"]
        np.testing.assert_allclose(
            np.asarray(got),
            [tvn.cascades[0].lambda_reg.detach().numpy()[0]],
        )

    def test_dynamic_type_mismatch_raises(self, tmp_path):
        tvn = REF.varnet.VarNet(
            num_cascades=1, sens_chans=4, sens_pools=2, chans=4, pools=2,
            dynamic_type="XF",
        )
        hp = {"num_cascades": 1, "dynamic_type": "XF"}
        ckpt = _save_ckpt(tmp_path, tvn, "varnet", hp)
        from argparse import Namespace

        from cinemri_tpu.cli.common import _apply_torch_ckpt

        args = Namespace(
            from_torch_ckpt=ckpt, dynamic_type="2D", weight_sharing=False
        )
        with pytest.raises(ValueError, match="varnet-XF"):
            _apply_torch_ckpt(None, "varnet", args, None)


def test_hparam_translation_crnn_xpdnet():
    kw = build_kwargs_from_hparams(
        "xpdnet",
        {"num_cascades": 3, "sens_chans": 8, "sens_pools": 3,
         "crnn_chans": 18, "n_primal": 5, "lr": 3e-4},
        "CRNN",
    )
    assert kw == {"num_cascades": 3, "sens_chans": 8, "sens_pools": 3,
                  "chans": 18, "n_primal": 5}
