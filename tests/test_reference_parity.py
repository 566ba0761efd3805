"""Numerical parity against the reference PyTorch models with ported weights.

The strongest form of parity evidence: instantiate the reference's torch
modules (read-only at /root/reference), move their weights into this
framework's flax models, run both on identical inputs, and compare outputs
to float32 tolerance. Covers the denoiser zoo and the full model stacks.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from cinemri_tpu.models import build_model
from cinemri_tpu.models.denoisers import MWCNN, NormUnet, Unet
from cinemri_tpu.ops.cplx import from_complex, to_numpy
from tests import _torch_ref as tr

REF = tr.load_reference()
torch.manual_seed(0)


def _crandn(rng, *shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        np.complex64
    )


def _mask(rng, t, h, center=6):
    m = np.zeros((1, t, 1, h, 1), np.float32)
    m[:, :, :, h // 2 - center // 2 : h // 2 + center // 2] = 1
    extra = rng.choice(h, h // 3, replace=False)
    m[:, :, :, extra] = 1
    m[:, :, :, 1] = 0
    m[:, :, :, h - 2] = 0  # zeros flank the center band
    return m


class TestDenoiserParity:
    @pytest.mark.parametrize("h,w", [(32, 32), (21, 27)])
    def test_unet2d(self, rng, h, w):
        tun = REF.unet.Unet(chans=8, num_pool_layers=3, in_chans=2, out_chans=2).eval()
        x = rng.standard_normal((2, 2, h, w)).astype(np.float32)
        with torch.no_grad():
            want = tun(torch.from_numpy(x)).numpy()

        fun = Unet(chans=8, num_pool_layers=3)
        params = {"params": tr.unet_params(tun)}
        got = np.asarray(fun.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=2e-4, atol=2e-5)

    def test_unet3d(self, rng):
        tun = REF.unet.Unet(chans=4, num_pool_layers=2, dims=3).eval()
        x = rng.standard_normal((1, 2, 6, 16, 16)).astype(np.float32)
        with torch.no_grad():
            want = tun(torch.from_numpy(x)).numpy()
        fun = Unet(chans=4, num_pool_layers=2, dims=3)
        params = {"params": tr.unet_params(tun)}
        got = np.asarray(fun.apply(params, jnp.asarray(x.transpose(0, 2, 3, 4, 1))))
        np.testing.assert_allclose(
            got.transpose(0, 4, 1, 2, 3), want, rtol=2e-4, atol=2e-5
        )

    def test_norm_unet(self, rng):
        tnu = REF.norm_unet.NormUnet(chans=8, num_pools=2).eval()
        x = _crandn(rng, 3, 24, 20)
        xt = torch.from_numpy(
            np.stack([x.real, x.imag], -1).astype(np.float32)
        ).unsqueeze(1)  # (n, 1, h, w, 2)
        with torch.no_grad():
            want = tnu(xt).numpy()
        want = want[:, 0, :, :, 0] + 1j * want[:, 0, :, :, 1]

        fnu = NormUnet(chans=8, num_pools=2)
        params = {"params": tr.norm_unet_params(tnu)}
        got = to_numpy(fnu.apply(params, from_complex(x)))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)

    def test_mwcnn(self, rng):
        tm = REF.mwcnn.MWCNN(
            in_chans=6, out_chans=4, n_scales=2,
            n_filters_per_scale=[4, 8], n_convs_per_scale=[2, 2],
            n_first_convs=1, first_conv_n_filters=4,
        ).eval()
        x = rng.standard_normal((2, 6, 16, 24)).astype(np.float32)
        # reference IWT hardcodes .cuda() (mwcnn.py:257); route it to CPU
        with torch.no_grad(), _cpu_cuda():
            want = tm(torch.from_numpy(x)).numpy()
        fm = MWCNN(in_chans=6, out_chans=4, n_scales=2,
                   n_filters_per_scale=(4, 8), n_convs_per_scale=(2, 2),
                   n_first_convs=1, first_conv_n_filters=4)
        params = {"params": tr.mwcnn_params(tm)}
        got = np.asarray(fm.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, rtol=2e-4, atol=2e-5)


class _cpu_cuda:
    """Patch Tensor.cuda to a no-op so the reference's hardcoded .cuda()
    calls (mwcnn.py:257, recurrent_varnet.py:112,236) run on CPU."""

    def __enter__(self):
        self._cuda = torch.Tensor.cuda
        torch.Tensor.cuda = lambda self_, *a, **k: self_
        return self

    def __exit__(self, *exc):
        torch.Tensor.cuda = self._cuda
        return False


class TestModelParity:
    def _inputs(self, rng, t=4, c=3, h=24, w=20):
        k = _crandn(rng, 1, t, c, h, w)
        mask = _mask(rng, t, h)
        masked = k * mask
        return masked, mask

    def _varnet_params(self, tvn, num_cascades, dynamic_type):
        cascades = {}
        if dynamic_type in ("XF", "XT"):
            cascades["net_xf"] = tr.norm_unet_params(tvn.model[0])
            cascades["net_yf"] = tr.norm_unet_params(tvn.model[1])
        else:
            cascades["net"] = tr.norm_unet_params(tvn.model)
        lam = np.asarray(
            [blk.lambda_reg.detach().numpy()[0] for blk in tvn.cascades],
            np.float32,
        )
        return {
            "params": {
                "sens_net": tr.sens_model_params(tvn.sens_net),
                "cascades": cascades,
                "lambda_reg": lam,
            }
        }

    @pytest.mark.parametrize("dynamic_type", ["XF", "XT", "2D", "3D"])
    def test_varnet_full_model(self, rng, dynamic_type):
        """Full VarNet forward: sens model + 2 cascades + soft DC."""
        masked, mask = self._inputs(rng)
        tvn = REF.varnet.VarNet(
            num_cascades=2, sens_chans=4, sens_pools=2, chans=4, pools=2,
            dynamic_type=dynamic_type,
        ).eval()
        with torch.no_grad():
            want = tvn(tr.to_torch_complex6(masked), tr.mask_to_torch(mask)).numpy()

        fvn = build_model(
            "varnet", dynamic_type, num_cascades=2, sens_chans=4, sens_pools=2,
            chans=4, pools=2, kernel_dc=False,  # torch computes the direct form
        )
        params = self._varnet_params(tvn, 2, dynamic_type)
        got = np.asarray(fvn.apply(params, from_complex(masked), jnp.asarray(mask)))
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)

    def test_cinenet_full_model(self, rng):
        masked, mask = self._inputs(rng)
        sens = _crandn(rng, 1, 1, 3, 24, 20)
        sens /= np.sqrt((np.abs(sens) ** 2).sum(2, keepdims=True))
        tcn = REF.cinenet.CineNet(
            num_cascades=2, CG_iters=3, chans=4, pools=2, dynamic_type="XF"
        ).eval()
        with torch.no_grad():
            want = tcn(
                tr.to_torch_complex6(masked),
                tr.mask_to_torch(mask).float(),
                tr.to_torch_complex6(sens),
            ).numpy()

        fcn = build_model("cinenet", "XF", num_cascades=2, cg_iters=3, chans=4, pools=2)
        cascades = {
            "net_xf": tr.unet_params(tcn.model[0]),
            "net_yf": tr.unet_params(tcn.model[1]),
        }
        lam = np.asarray(
            [blk.lambda_reg.detach().numpy()[0] for blk in tcn.cascades], np.float32
        )
        params = {"params": {"cascades": cascades, "lambda_reg": lam}}
        got = np.asarray(
            fcn.apply(params, from_complex(masked), jnp.asarray(mask), from_complex(sens))
        )
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)

    def test_varnet_crnn_full_model(self, rng):
        masked, mask = self._inputs(rng)
        with _cpu_cuda():
            tvr = REF.recurrent_varnet.VarNet_RNN(
                num_cascades=2, sens_chans=4, sens_pools=2, chans=6
            ).eval()
            with torch.no_grad():
                want = tvr(tr.to_torch_complex6(masked), tr.mask_to_torch(mask)).numpy()

        fvr = build_model("varnet", "CRNN", num_cascades=2, sens_chans=4,
                          sens_pools=2, chans=6, kernel_dc=False)
        params = {
            "params": {
                "sens_net": tr.sens_model_params(tvr.sens_net),
                "iterations": {
                    "trunk": tr.crnn_trunk_params(tvr),
                    "lambda_reg": np.float32(tvr.lambda_reg.detach().numpy()[0]),
                },
            }
        }
        got = np.asarray(fvr.apply(params, from_complex(masked), jnp.asarray(mask)))
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


class TestXPDNetParity:
    def test_xpdnet_full_model(self, rng):
        """Full XPDNet-XF: sens U-Net, primal buffers, per-cascade MWCNNs,
        the alt temporal-FFT quirk, MWCNN padding, measurement residual."""
        t, c, h, w = 4, 3, 24, 20
        k = _crandn(rng, 1, t, c, h, w)
        mask = _mask(rng, t, h)
        masked = k * mask

        with _cpu_cuda():
            # first_conv_n_filters must be >= out_chans (2*n_primal) for the
            # MWCNN's final skip to typecheck — a reference constraint
            txp = REF.xpdnet.XPDNet(
                num_cascades=2, sens_chans=4, sens_pools=2, n_scales=2,
                n_filters_per_scale=[4, 8], n_convs_per_scale=[2, 2],
                n_first_convs=1, first_conv_n_filters=6, n_primal=3,
                dynamic_type="XF",
            ).eval()
            with torch.no_grad():
                want = txp(
                    tr.to_torch_complex6(masked), tr.mask_to_torch(mask)
                ).numpy()

        fxp = build_model(
            "xpdnet", "XF", num_cascades=2, sens_chans=4, sens_pools=2,
            n_scales=2, n_filters_per_scale=(4, 8), n_convs_per_scale=(2, 2),
            n_first_convs=1, first_conv_n_filters=6, n_primal=3,
            kernel_dc=False,  # torch computes the direct form
        )

        # per-cascade torch MWCNN pairs -> stacked flax params (scan axis 0)
        per_cascade = [
            {
                "image_net_xf": tr.mwcnn_params(txp.image_net[i][0]),
                "image_net_yf": tr.mwcnn_params(txp.image_net[i][1]),
            }
            for i in range(2)
        ]
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *per_cascade)
        sens = {"Unet_0": tr.unet_params(txp.sens_net.unet_model)}
        params = {"params": {"sens_net": sens, "cascades": stacked}}
        got = np.asarray(fxp.apply(params, from_complex(masked), jnp.asarray(mask)))
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


class TestRecurrentParity:
    def test_cinenet_crnn_full_model(self, rng):
        t, c, h, w = 4, 3, 24, 20
        k = _crandn(rng, 1, t, c, h, w)
        mask = _mask(rng, t, h)
        masked = k * mask
        sens = _crandn(rng, 1, 1, c, h, w)
        sens /= np.sqrt((np.abs(sens) ** 2).sum(2, keepdims=True))

        with _cpu_cuda():
            tcr = REF.recurrent_cinenet.CineNet_RNN(
                num_cascades=2, CG_iters=2, chans=6
            ).eval()
            with torch.no_grad():
                want = tcr(
                    tr.to_torch_complex6(masked),
                    tr.mask_to_torch(mask).float(),
                    tr.to_torch_complex6(sens),
                ).numpy()

        fcr = build_model("cinenet", "CRNN", num_cascades=2, cg_iters=2, chans=6)
        params = {
            "params": {
                "iterations": {
                    "trunk": tr.crnn_trunk_params(tcr),
                    "lambda_reg": np.float32(tcr.lambda_reg.detach().numpy()[0]),
                }
            }
        }
        got = np.asarray(
            fcr.apply(params, from_complex(masked), jnp.asarray(mask), from_complex(sens))
        )
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)

    def test_xpdnet_crnn_full_model(self, rng):
        t, c, h, w = 4, 3, 24, 20
        k = _crandn(rng, 1, t, c, h, w)
        mask = _mask(rng, t, h)
        masked = k * mask

        with _cpu_cuda():
            txr = REF.recurrent_xpdnet.XPDNet_RNN(
                num_cascades=2, sens_chans=4, sens_pools=2, chans=6, n_primal=3
            ).eval()
            with torch.no_grad():
                want = txr(tr.to_torch_complex6(masked), tr.mask_to_torch(mask)).numpy()

        fxr = build_model(
            "xpdnet", "CRNN", num_cascades=2, sens_chans=4, sens_pools=2,
            chans=6, n_primal=3, kernel_dc=False,
        )
        params = {
            "params": {
                "sens_net": {"Unet_0": tr.unet_params(txr.sens_net.unet_model)},
                "iterations": {"trunk": tr.crnn_trunk_params(txr)},
            }
        }
        got = np.asarray(fxr.apply(params, from_complex(masked), jnp.asarray(mask)))
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


class TestXPDNetDualBufferParity:
    def test_xpdnet_dual_buffer_with_kspace_cnn(self, rng):
        """primal_only=False: the KSpaceCNN dual-buffer path vs torch."""
        t, c, h, w = 3, 2, 16, 16
        k = _crandn(rng, 1, t, c, h, w)
        mask = _mask(rng, t, h, center=4)
        masked = k * mask

        with _cpu_cuda():
            txp = REF.xpdnet.XPDNet(
                num_cascades=2, sens_chans=4, sens_pools=2, n_scales=2,
                n_filters_per_scale=[4, 8], n_convs_per_scale=[2, 2],
                n_first_convs=1, first_conv_n_filters=6, n_primal=3,
                primal_only=False, n_dual=2, dynamic_type="XF",
            ).eval()
            with torch.no_grad():
                want = txp(tr.to_torch_complex6(masked), tr.mask_to_torch(mask)).numpy()

        fxp = build_model(
            "xpdnet", "XF", num_cascades=2, sens_chans=4, sens_pools=2,
            n_scales=2, n_filters_per_scale=(4, 8), n_convs_per_scale=(2, 2),
            n_first_convs=1, first_conv_n_filters=6, n_primal=3,
            primal_only=False, n_dual=2,
        )

        def kspace_cnn_params(tknet):
            # reference KSpaceCNN: Sequential [Conv3d, ReLU, Conv3d, ReLU, Conv3d]
            convs = [m for m in tknet.layers if hasattr(m, "weight")]
            return {f"Conv_{i}": tr.conv_w(m) for i, m in enumerate(convs)}

        per_cascade = [
            {
                "image_net_xf": tr.mwcnn_params(txp.image_net[i][0]),
                "image_net_yf": tr.mwcnn_params(txp.image_net[i][1]),
                "kspace_net": kspace_cnn_params(txp.kspace_net[i]),
            }
            for i in range(2)
        ]
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *per_cascade)
        params = {
            "params": {
                "sens_net": {"Unet_0": tr.unet_params(txp.sens_net.unet_model)},
                "cascades": stacked,
            }
        }
        got = np.asarray(fxp.apply(params, from_complex(masked), jnp.asarray(mask)))
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


class TestWeightSharingParity:
    def test_varnet_xf_weight_sharing(self, rng):
        """weight_sharing=True: one NormUnet serves both rotated planes
        (varnet.py:135-138)."""
        t, c, h, w = 4, 3, 24, 20
        k = _crandn(rng, 1, t, c, h, w)
        mask = _mask(rng, t, h)
        masked = k * mask
        tvn = REF.varnet.VarNet(
            num_cascades=2, sens_chans=4, sens_pools=2, chans=4, pools=2,
            dynamic_type="XF", weight_sharing=True,
        ).eval()
        with torch.no_grad():
            want = tvn(tr.to_torch_complex6(masked), tr.mask_to_torch(mask)).numpy()

        fvn = build_model(
            "varnet", "XF", num_cascades=2, sens_chans=4, sens_pools=2,
            chans=4, pools=2, weight_sharing=True, kernel_dc=False,
        )
        lam = np.asarray(
            [blk.lambda_reg.detach().numpy()[0] for blk in tvn.cascades], np.float32
        )
        params = {
            "params": {
                "sens_net": tr.sens_model_params(tvn.sens_net),
                "cascades": {"plane_net": tr.norm_unet_params(tvn.model)},
                "lambda_reg": lam,
            }
        }
        got = np.asarray(fvn.apply(params, from_complex(masked), jnp.asarray(mask)))
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


class TestTrainingParity:
    """Training-dynamics equivalence: gradients and one Adam step match
    torch on the same weights — metric parity of a full training run then
    reduces to data-protocol parity (established elsewhere)."""

    def _setup(self, rng):
        tun = REF.unet.Unet(chans=4, num_pool_layers=2, in_chans=2, out_chans=2)
        x = rng.standard_normal((2, 2, 16, 16)).astype(np.float32)
        fun = Unet(chans=4, num_pool_layers=2)
        params = {"params": tr.unet_params(tun)}
        return tun, fun, params, x

    def test_gradients_match(self, rng):
        tun, fun, params, x = self._setup(rng)
        xt = torch.from_numpy(x).requires_grad_(False)
        out = tun(xt)
        loss_t = 0.5 * (out ** 2).sum()
        loss_t.backward()

        def loss_f(p):
            o = fun.apply(p, jnp.asarray(x.transpose(0, 2, 3, 1)))
            return 0.5 * jnp.sum(o ** 2)

        loss_j, grads = jax.value_and_grad(loss_f)(params)
        np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-4)

        # spot-check representative tensors through the weight conversion
        g_first = grads["params"]["ConvBlock_0"]["Conv_0"]["kernel"]
        tg_first = tun.down_sample_layers[0].layers[0].weight.grad.numpy()
        np.testing.assert_allclose(
            np.asarray(g_first), tg_first.transpose(2, 3, 1, 0), rtol=2e-3, atol=2e-4
        )
        g_T = grads["params"]["TransposeConvBlock_0"]["ConvTranspose_0"]["kernel"]
        tg_T = tun.up_transpose_conv[0].layers[0].weight.grad.numpy()
        tg_T = np.flip(tg_T, axis=(2, 3)).transpose(2, 3, 0, 1)
        np.testing.assert_allclose(np.asarray(g_T), tg_T, rtol=2e-3, atol=2e-4)
        g_b = grads["params"]["Conv_0"]["bias"]
        tg_b = tun.up_conv[-1][1].bias.grad.numpy()
        np.testing.assert_allclose(np.asarray(g_b), tg_b, rtol=2e-3, atol=2e-4)

    def test_one_adam_step_matches(self, rng):
        """torch.optim.Adam vs our make_optimizer on identical weights and
        gradients (same lr/beta/eps semantics, StepLR far away)."""
        from cinemri_tpu.train import make_optimizer

        tun, fun, params, x = self._setup(rng)
        opt_t = torch.optim.Adam(tun.parameters(), lr=1e-3)
        out = tun(torch.from_numpy(x))
        (0.5 * (out ** 2).sum()).backward()
        opt_t.step()

        def loss_f(p):
            o = fun.apply(p, jnp.asarray(x.transpose(0, 2, 3, 1)))
            return 0.5 * jnp.sum(o ** 2)

        tx = make_optimizer(lr=1e-3, lr_step_size=10**6, steps_per_epoch=1)
        opt_state = tx.init(params)
        grads = jax.grad(loss_f)(params)
        updates, _ = tx.update(grads, opt_state, params)
        import optax

        new_params = optax.apply_updates(params, updates)

        got = np.asarray(new_params["params"]["ConvBlock_0"]["Conv_0"]["kernel"])
        want = tun.down_sample_layers[0].layers[0].weight.detach().numpy()
        np.testing.assert_allclose(got, want.transpose(2, 3, 1, 0), rtol=2e-4, atol=2e-5)


class TestCineNetVariantParity:
    @pytest.mark.parametrize("dynamic_type", ["2D", "3D"])
    def test_cinenet_2d_3d(self, rng, dynamic_type):
        t, c, h, w = 4, 3, 24, 20
        k = _crandn(rng, 1, t, c, h, w)
        mask = _mask(rng, t, h)
        masked = k * mask
        sens = _crandn(rng, 1, 1, c, h, w)
        sens /= np.sqrt((np.abs(sens) ** 2).sum(2, keepdims=True))
        tcn = REF.cinenet.CineNet(
            num_cascades=2, CG_iters=2, chans=4, pools=2, dynamic_type=dynamic_type
        ).eval()
        with torch.no_grad():
            want = tcn(
                tr.to_torch_complex6(masked),
                tr.mask_to_torch(mask).float(),
                tr.to_torch_complex6(sens),
            ).numpy()

        fcn = build_model(
            "cinenet", dynamic_type, num_cascades=2, cg_iters=2, chans=4, pools=2
        )
        lam = np.asarray(
            [blk.lambda_reg.detach().numpy()[0] for blk in tcn.cascades], np.float32
        )
        params = {
            "params": {
                "cascades": {"net": tr.unet_params(tcn.model)},
                "lambda_reg": lam,
            }
        }
        got = np.asarray(
            fcn.apply(params, from_complex(masked), jnp.asarray(mask), from_complex(sens))
        )
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)
