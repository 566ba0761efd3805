"""Model-layer tests: all 3 families x 5 dynamic variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cinemri_tpu.models import build_model
from cinemri_tpu.models.denoisers import MWCNN, NormUnet, NormUnet3D, Unet
from cinemri_tpu.ops.cplx import from_complex
from cinemri_tpu.ops.ssim import ssim_loss

B, T, C, H, W = 1, 4, 3, 24, 16
SMALL = dict(
    varnet=dict(num_cascades=2, sens_chans=4, sens_pools=2, chans=4, pools=2),
    cinenet=dict(num_cascades=2, cg_iters=2, chans=4, pools=2),
    xpdnet=dict(
        num_cascades=2,
        sens_chans=4,
        sens_pools=2,
        n_scales=2,
        n_filters_per_scale=(4, 8),
        n_convs_per_scale=(2, 2),
        n_primal=3,
    ),
)
CRNN_SMALL = dict(
    varnet=dict(num_cascades=2, sens_chans=4, sens_pools=2, chans=6),
    cinenet=dict(num_cascades=2, cg_iters=2, chans=6),
    xpdnet=dict(num_cascades=2, sens_chans=4, sens_pools=2, chans=6, n_primal=3),
)
VARIANTS = {
    "varnet": ("2D", "3D", "XT", "XF", "CRNN"),
    "cinenet": ("2D", "3D", "XT", "XF", "CRNN"),
    "xpdnet": ("2D", "XT", "XF", "CRNN"),  # 3D excluded (xpdnet_module.py:100-101)
}


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    k = (rng.standard_normal((B, T, C, H, W)) + 1j * rng.standard_normal((B, T, C, H, W))).astype(np.complex64)
    m = np.zeros((B, T, 1, H, 1), np.float32)
    m[:, :, :, H // 2 - 3 : H // 2 + 3] = 1
    m[:, :, :, 2] = 1
    m[:, :, :, H - 3] = 1
    sens = (rng.standard_normal((B, 1, C, H, W)) + 1j * rng.standard_normal((B, 1, C, H, W))).astype(np.complex64)
    sens /= np.sqrt((np.abs(sens) ** 2).sum(2, keepdims=True))
    return from_complex(k * m), jnp.asarray(m), from_complex(sens)


def _make(family, dyn):
    kwargs = CRNN_SMALL[family] if dyn == "CRNN" else SMALL[family]
    return build_model(family, dyn, **kwargs)


def _apply(model, family, batch, params=None):
    k, m, sens = batch
    args = (k, m, sens) if family == "cinenet" else (k, m)
    if params is None:
        params = model.init(jax.random.PRNGKey(0), *args)
    return params, model.apply(params, *args)


@pytest.mark.parametrize(
    "family,dyn", [(f, d) for f, ds in VARIANTS.items() for d in ds]
)
class TestAllVariants:
    def test_forward_shape_finite_deterministic(self, family, dyn, batch):
        model = _make(family, dyn)
        params, out = _apply(model, family, batch)
        assert out.shape == (B, T, H, W)
        assert out.dtype == jnp.float32
        assert bool(jnp.isfinite(out).all())
        _, out2 = _apply(model, family, batch, params)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))

    def test_gradients_flow_to_all_params(self, family, dyn, batch):
        model = _make(family, dyn)
        k, m, sens = batch
        args = (k, m, sens) if family == "cinenet" else (k, m)
        params = model.init(jax.random.PRNGKey(0), *args)
        target = k.abs().mean(axis=2)  # (B, T, H, W) dummy target

        def loss_fn(p):
            return ssim_loss(model.apply(p, *args), target)

        loss0, grads = jax.value_and_grad(loss_fn)(params)
        leaves = jax.tree.leaves(grads)
        assert all(bool(jnp.isfinite(g).all()) for g in leaves)
        nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in leaves)
        assert nonzero / len(leaves) > 0.9  # essentially every tensor learns
        # one SGD step along -grad reduces the loss (sane descent direction)
        gnorm = jnp.sqrt(
            sum(jnp.sum(g * g) for g in leaves)
        )
        lr = 0.01 / (gnorm + 1e-12)
        stepped = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        loss1 = loss_fn(stepped)
        assert float(loss1) < float(loss0)


class TestStructure:
    def test_varnet_per_cascade_lambda_init(self, batch):
        model = _make("varnet", "XF")
        params, _ = _apply(model, "varnet", batch)
        lam = params["params"]["lambda_reg"]
        assert lam.shape == (2,)
        np.testing.assert_allclose(jax.nn.softplus(lam), 1.0, rtol=1e-6)

    def test_weight_sharing_halves_plane_nets(self, batch):
        def nparams(ws):
            m = build_model("varnet", "XF", weight_sharing=ws, **SMALL["varnet"])
            p, _ = _apply(m, "varnet", batch)
            return sum(x.size for x in jax.tree.leaves(p))

        shared, separate = nparams(True), nparams(False)
        assert separate > shared

    def test_xpdnet_params_stacked_per_cascade(self, batch):
        model = _make("xpdnet", "XF")
        params, _ = _apply(model, "xpdnet", batch)
        cascades = params["params"]["cascades"]
        leaf = jax.tree.leaves(cascades)[0]
        assert leaf.shape[0] == 2  # leading num_cascades axis

    def test_varnet_cascades_share_denoiser(self, batch):
        model = _make("varnet", "XF")
        params, _ = _apply(model, "varnet", batch)
        cascades = params["params"]["cascades"]
        # broadcast variables: no leading cascade axis on conv kernels
        kernel = jax.tree.leaves(cascades)[0]
        assert kernel.shape[0] != 2 or kernel.ndim < 3

    def test_rnn_lambda_scalar_shared(self, batch):
        model = _make("varnet", "CRNN")
        params, _ = _apply(model, "varnet", batch)
        lam = params["params"]["iterations"]["lambda_reg"]
        assert lam.shape == ()


class TestDenoisers:
    def test_unet_odd_sizes(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 21, 19, 2)).astype(np.float32))
        m = Unet(chans=4, num_pool_layers=3)
        p = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(p, x).shape == (2, 21, 19, 2)

    def test_unet3d(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 5, 12, 10, 2)).astype(np.float32))
        m = Unet(chans=4, num_pool_layers=2, dims=3)
        p = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(p, x).shape == (1, 5, 12, 10, 2)

    def test_norm_unet_complex_roundtrip_shapes(self, rng):
        x = from_complex(
            (rng.standard_normal((3, 30, 22)) + 1j * rng.standard_normal((3, 30, 22))).astype(np.complex64)
        )
        m = NormUnet(chans=4, num_pools=2)
        p = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(p, x)
        assert out.shape == x.shape and out.dtype == jnp.float32

    def test_norm_unet_scale_equivariance(self, rng):
        """Input normalization makes the wrapper ~scale-equivariant."""
        from cinemri_tpu.ops.cplx import to_numpy

        x = from_complex(
            (rng.standard_normal((1, 16, 16)) + 1j * rng.standard_normal((1, 16, 16))).astype(np.complex64)
        )
        m = NormUnet(chans=4, num_pools=2)
        p = m.init(jax.random.PRNGKey(0), x)
        a = to_numpy(m.apply(p, x))
        b = to_numpy(m.apply(p, x * 1000.0))
        np.testing.assert_allclose(b, a * 1000.0, rtol=2e-2, atol=2e-2)

    def test_norm_unet3d(self, rng):
        x = from_complex(
            (rng.standard_normal((1, 5, 18, 18)) + 1j * rng.standard_normal((1, 5, 18, 18))).astype(np.complex64)
        )
        m = NormUnet3D(chans=4, num_pools=2)
        p = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(p, x).shape == x.shape

    def test_mwcnn_shapes_and_divisibility_check(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 16, 24, 12)).astype(np.float32))
        m = MWCNN(in_chans=12, out_chans=10, n_scales=2, n_filters_per_scale=(4, 8), n_convs_per_scale=(2, 2))
        p = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(p, x).shape == (2, 16, 24, 10)
        with pytest.raises(ValueError):
            m.init(jax.random.PRNGKey(0), jnp.zeros((2, 15, 24, 12)))

    def test_build_model_rejects_unknown(self):
        with pytest.raises(ValueError):
            build_model("foonet")
        with pytest.raises(ValueError):
            build_model("xpdnet", "3D", **SMALL["xpdnet"])


class TestRobustness:
    @pytest.mark.parametrize("family,dyn", [("cinenet", "XF"), ("cinenet", "CRNN")])
    def test_kernel_dc_matches_direct_cg(self, family, dyn, batch):
        """The precomputed-kernel CG normal operator is a pure speed
        restructuring — forwards must match the direct-FFT path."""
        kwargs = CRNN_SMALL[family] if dyn == "CRNN" else SMALL[family]
        k, m, sens = batch
        fast = build_model(family, dyn, kernel_dc=True, **kwargs)
        slow = build_model(family, dyn, kernel_dc=False, **kwargs)
        p = fast.init(jax.random.PRNGKey(0), k, m, sens)
        np.testing.assert_allclose(
            np.asarray(fast.apply(p, k, m, sens)),
            np.asarray(slow.apply(p, k, m, sens)),
            rtol=1e-4, atol=1e-4,
        )

    @pytest.mark.parametrize(
        "family,dyn", [("varnet", "XF"), ("varnet", "2D"), ("varnet", "3D"),
                       ("varnet", "CRNN"), ("xpdnet", "XF"), ("xpdnet", "CRNN")]
    )
    def test_image_space_dc_collapse_single_cascade(self, family, dyn, batch):
        """physics.soft_dc_image_kernel: one cascade of the image-space
        collapsed DC must match the direct k-space round trip to f32
        rounding. (One cascade deliberately: across MULTIPLE cascades the
        XF/2D NormUnets divide by small-group stds, which chaotically
        amplifies the ~1e-7 per-cascade rounding difference — both paths
        are equally valid numerics, certified at the trained-metric level
        by bench/parity_head_to_head.py on the default kernel path.)"""
        kwargs = dict(
            (CRNN_SMALL[family] if dyn == "CRNN" else SMALL[family]),
            num_cascades=1,
        )
        k, m, _ = batch
        fast = build_model(family, dyn, kernel_dc=True, **kwargs)
        slow = build_model(family, dyn, kernel_dc=False, **kwargs)
        p = fast.init(jax.random.PRNGKey(0), k, m)
        np.testing.assert_allclose(
            np.asarray(fast.apply(p, k, m)),
            np.asarray(slow.apply(p, k, m)),
            rtol=1e-4, atol=1e-5,
        )

    def test_remat_matches_no_remat(self, batch):
        """Rematerialized cascades must be numerically identical."""
        k, m, _ = batch
        a = build_model("varnet", "XF", remat=True, **SMALL["varnet"])
        b = build_model("varnet", "XF", remat=False, **SMALL["varnet"])
        p = a.init(jax.random.PRNGKey(0), k, m)
        np.testing.assert_allclose(
            np.asarray(a.apply(p, k, m)), np.asarray(b.apply(p, k, m)),
            rtol=1e-6, atol=1e-7,
        )

    @pytest.mark.parametrize("policy", ["dots", "dots_batch", "convs"])
    def test_remat_policy_exact_forward_and_grad(self, policy, batch):
        """Checkpoint policies change only WHAT the backward pass saves vs
        recomputes — loss and gradients must be bit-comparable to the
        default save-nothing remat (models/remat.py)."""
        k, m, _ = batch
        tgt = jnp.abs(k.re[:, :, 0])  # any (b,t,h,w) target

        def loss_of(model):
            p = model.init(jax.random.PRNGKey(0), k, m)

            def f(pp):
                return ssim_loss(model.apply(pp, k, m), tgt)

            loss, g = jax.value_and_grad(f)(p)
            return float(loss), jax.tree.leaves(g)

        base = build_model("varnet", "XF", **SMALL["varnet"])
        mod = build_model(
            "varnet", "XF", remat_policy=policy, remat_prevent_cse=False,
            **SMALL["varnet"],
        )
        l0, g0 = loss_of(base)
        l1, g1 = loss_of(mod)
        assert l0 == pytest.approx(l1, rel=1e-6)
        for a, b in zip(g0, g1):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            )

    def test_remat_policy_exact_crnn(self, batch):
        """Same exactness through the iteration-recurrent families."""
        k, m, _ = batch
        tgt = jnp.abs(k.re[:, :, 0])

        def loss_of(model):
            p = model.init(jax.random.PRNGKey(0), k, m)

            def f(pp):
                return ssim_loss(model.apply(pp, k, m), tgt)

            loss, g = jax.value_and_grad(f)(p)
            return float(loss), jax.tree.leaves(g)

        base = build_model("varnet", "CRNN", **CRNN_SMALL["varnet"])
        mod = build_model(
            "varnet", "CRNN", remat_policy="convs", remat_prevent_cse=False,
            **CRNN_SMALL["varnet"],
        )
        l0, g0 = loss_of(base)
        l1, g1 = loss_of(mod)
        assert l0 == pytest.approx(l1, rel=1e-6)
        for a, b in zip(g0, g1):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            )

    def test_equispaced_static_mask_broadcasts(self, rng):
        """Equispaced masks are (b, 1, 1, h, 1) — a single frame broadcast
        over time (subsample.py:210-214); the whole stack must accept it."""
        from cinemri_tpu.data.masks import EquispacedMask
        from cinemri_tpu.ops.cplx import from_complex

        t, c, h, w = 3, 2, 24, 16
        k = (rng.standard_normal((1, t, c, h, w)) + 1j * rng.standard_normal((1, t, c, h, w))).astype(np.complex64)
        mask = EquispacedMask([0.25], [2])(t, h, seed=4)[None]  # (1,1,1,h,1)
        assert mask.shape == (1, 1, 1, h, 1)
        model = build_model("varnet", "XF", **SMALL["varnet"])
        km, m = from_complex(k * mask), jnp.asarray(mask.astype(np.float32))
        p = model.init(jax.random.PRNGKey(0), km, m)
        out = model.apply(p, km, m)
        assert out.shape == (1, t, h, w) and bool(jnp.isfinite(out).all())

    def test_eightfold_acceleration_mask(self, rng):
        """The notebook's 8x experiments: masks stay valid and models run."""
        from cinemri_tpu.data.masks import RandomMask
        from cinemri_tpu.ops.cplx import from_complex

        t, c, h, w = 3, 2, 32, 16
        mask = RandomMask([4], [8])(t, h, seed=1)[None]
        assert mask[0, :, 0, :, 0].sum(axis=1).max() <= h // 8 + 1
        k = (rng.standard_normal((1, t, c, h, w)) + 1j * rng.standard_normal((1, t, c, h, w))).astype(np.complex64)
        model = build_model("varnet", "2D", **SMALL["varnet"])
        km, m = from_complex(k * mask), jnp.asarray(mask.astype(np.float32))
        p = model.init(jax.random.PRNGKey(0), km, m)
        assert bool(jnp.isfinite(model.apply(p, km, m)).all())


class TestTorchStyleInit:
    def test_matches_torch_conv_statistics(self, batch):
        """kernels ~ U(±1/sqrt(fan_in)); λ untouched; deterministic by key."""
        from cinemri_tpu.models import torch_style_init

        model = _make("varnet", "XF")
        params, _ = _apply(model, "varnet", batch)
        re1 = torch_style_init(params, jax.random.PRNGKey(7))
        re2 = torch_style_init(params, jax.random.PRNGKey(7))
        for a, b in zip(jax.tree.leaves(re1), jax.tree.leaves(re2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        k = np.asarray(re1["params"]["cascades"]["net_xf"]["Unet_0"]["ConvBlock_0"]["Conv_0"]["kernel"])
        fan_in = k.shape[0] * k.shape[1] * k.shape[2]
        bound = 1 / np.sqrt(fan_in)
        assert np.abs(k).max() <= bound + 1e-7
        assert np.abs(k).max() > 0.8 * bound  # actually fills the range
        # uniform variance = bound^2/3
        np.testing.assert_allclose(k.var(), bound ** 2 / 3, rtol=0.35)
        # lambda_reg keeps its explicit reference init (softplus -> 1)
        np.testing.assert_allclose(
            jax.nn.softplus(re1["params"]["lambda_reg"]), 1.0, rtol=1e-6
        )

    def test_model_still_runs_after_reinit(self, batch):
        from cinemri_tpu.models import torch_style_init

        model = _make("varnet", "2D")
        params, _ = _apply(model, "varnet", batch)
        re = torch_style_init(params, jax.random.PRNGKey(0))
        _, out = _apply(model, "varnet", batch, re)
        assert bool(jnp.isfinite(out).all())


class TestFusedSumConv:
    def test_equals_sum_of_convs(self, rng):
        """conv(x,Wx)+conv(h,Wh) == fused conv([x,h],[Wx;Wh]) + summed bias."""
        import flax.linen as nn
        from cinemri_tpu.models.denoisers.crnn import fused_sum_conv

        x = jnp.asarray(rng.standard_normal((2, 12, 10, 3)).astype(np.float32))
        h = jnp.asarray(rng.standard_normal((2, 12, 10, 5)).astype(np.float32))

        class Fused(nn.Module):
            @nn.compact
            def __call__(self, x, h):
                return fused_sum_conv(4, 3, "c", x, h)

        m = Fused()
        p = m.init(jax.random.PRNGKey(0), x, h)
        k = p["params"]["c__f3_5"]["kernel"]  # (3, 3, 8, 4)
        b = p["params"]["c__f3_5"]["bias"]
        got = m.apply(p, x, h)

        def conv(inp, kern):
            return jax.lax.conv_general_dilated(
                inp, kern, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        want = conv(x, k[:, :, :3]) + conv(h, k[:, :, 3:]) + b
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    def test_per_slice_init_statistics(self):
        """Each input slice of the fused kernel starts with the variance of
        the separate conv it replaces, under both flax init and
        torch_style_init (ADVICE r2: a single fan_in = k*k*(c1+c2) draw
        would start the narrow input branch ~sqrt((c1+c2)/c1)x too small)."""
        import flax.linen as nn
        from cinemri_tpu.models import torch_style_init
        from cinemri_tpu.models.denoisers.crnn import fused_sum_conv

        x = jnp.zeros((1, 32, 32, 2))
        h = jnp.zeros((1, 32, 32, 64))

        class Fused(nn.Module):
            @nn.compact
            def __call__(self, x, h):
                return fused_sum_conv(64, 3, "c", x, h)

        m = Fused()
        p = m.init(jax.random.PRNGKey(0), x, h)
        k = np.asarray(p["params"]["c__f2_64"]["kernel"])
        # flax path: per-slice lecun_normal -> var = 1/(9*slice)
        np.testing.assert_allclose(k[:, :, :2].var(), 1 / (9 * 2), rtol=0.3)
        np.testing.assert_allclose(k[:, :, 2:].var(), 1 / (9 * 64), rtol=0.3)

        pt = torch_style_init(p, jax.random.PRNGKey(1))
        kt = np.asarray(pt["params"]["c__f2_64"]["kernel"])
        # torch path: per-slice U(+-1/sqrt(9*slice)) -> var = bound^2/3
        np.testing.assert_allclose(kt[:, :, :2].var(), 1 / (3 * 9 * 2), rtol=0.3)
        np.testing.assert_allclose(kt[:, :, 2:].var(), 1 / (3 * 9 * 64), rtol=0.3)
        assert np.abs(kt[:, :, :2]).max() <= 1 / np.sqrt(9 * 2) + 1e-7
        assert np.abs(kt[:, :, 2:]).max() <= 1 / np.sqrt(9 * 64) + 1e-7
        # bias: sum of two per-conv uniform draws
        bt = np.asarray(pt["params"]["c__f2_64"]["bias"])
        assert np.abs(bt).max() <= 1 / np.sqrt(9 * 2) + 1 / np.sqrt(9 * 64)
        assert bt.var() > 0


class TestPackedUnet:
    """Space-to-depth execution must be numerically identical to the plain
    Unet under the SAME parameter tree (denoisers/packed_unet.py)."""

    def _compare(self, dims, shape, chans=16, pools=3, seed=0, tol=2e-4):
        import flax.linen as nn
        from cinemri_tpu.models.denoisers.unet import Unet

        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((2,) + shape + (2,)).astype(np.float32))
        plain = Unet(chans=chans, num_pool_layers=pools, dims=dims)
        packed = Unet(chans=chans, num_pool_layers=pools, dims=dims, packed=True)
        p = plain.init(jax.random.PRNGKey(seed), x)
        p2 = packed.init(jax.random.PRNGKey(seed), x)
        # identical param trees (paths AND shapes) -> interchangeable ckpts
        flat1 = jax.tree_util.tree_flatten_with_path(p)[0]
        flat2 = jax.tree_util.tree_flatten_with_path(p2)[0]
        assert [(k, v.shape) for k, v in flat1] == [(k, v.shape) for k, v in flat2]
        a = np.asarray(plain.apply(p, x))
        b = np.asarray(packed.apply(p, x))
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(a / scale, b / scale, atol=tol)

    def test_3d_even_dims(self):
        self._compare(3, (16, 32, 32))

    def test_3d_odd_time(self):
        # CineNet's raw 3-D U-Net sees unpadded t=15-style inputs: odd dims
        # stay unpacked and exercise the decoder's trailing-pad fix
        self._compare(3, (7, 32, 24), pools=2)

    def test_3d_odd_everything(self):
        self._compare(3, (5, 25, 30), pools=2)

    def test_2d(self):
        self._compare(2, (48, 48))

    def test_2d_odd(self):
        self._compare(2, (50, 35), pools=3)

    def test_gradients_match(self):
        from cinemri_tpu.models.denoisers.unet import Unet

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((1, 8, 16, 16, 2)).astype(np.float32))
        plain = Unet(chans=8, num_pool_layers=2, dims=3)
        packed = Unet(chans=8, num_pool_layers=2, dims=3, packed=True)
        p = plain.init(jax.random.PRNGKey(0), x)
        g1 = jax.grad(lambda q: jnp.sum(plain.apply(q, x) ** 2))(p)
        g2 = jax.grad(lambda q: jnp.sum(packed.apply(q, x) ** 2))(p)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            s = np.abs(np.asarray(a)).max() + 1e-12
            np.testing.assert_allclose(
                np.asarray(a) / s, np.asarray(b) / s, atol=5e-4
            )


class TestPackedModels:
    """packed=True must reproduce the unpacked models exactly under the
    same params (the flag changes execution layout, not math)."""

    @pytest.mark.parametrize("family,dyn", [
        ("varnet", "3D"), ("varnet", "XF"), ("varnet", "2D"),
        ("cinenet", "3D"), ("cinenet", "XT"),
        ("varnet", "CRNN"), ("cinenet", "CRNN"), ("xpdnet", "CRNN"),
        ("xpdnet", "XF"), ("xpdnet", "2D"),
    ])
    def test_packed_matches_plain(self, family, dyn, batch):
        kwargs = dict(CRNN_SMALL[family] if dyn == "CRNN" else SMALL[family])
        plain = build_model(family, dyn, **kwargs)
        packed = build_model(family, dyn, packed=True, **kwargs)
        params, out_plain = _apply(plain, family, batch)
        _, out_packed = _apply(packed, family, batch, params)
        a, b = np.asarray(out_plain), np.asarray(out_packed)
        s = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(a / s, b / s, atol=5e-4)

    def test_wide_trunk_uses_half_block_and_matches(self, batch):
        """chans > 32 trunks pack (1, 2) — 128 lanes exactly, not 256
        (recurrent._trunk_block); equality must hold on that branch too."""
        from cinemri_tpu.models.recurrent import _trunk_block

        assert _trunk_block(16, 16, True, 18) == (2, 2)
        assert _trunk_block(16, 16, True, 64) == (1, 2)
        assert _trunk_block(16, 16, True, 200) == ()
        assert _trunk_block(15, 16, True, 18) == ()

        kwargs = dict(CRNN_SMALL["cinenet"], chans=34)  # selects (1, 2)
        plain = build_model("cinenet", "CRNN", **kwargs)
        packed = build_model("cinenet", "CRNN", packed=True, **kwargs)
        params, out_plain = _apply(plain, "cinenet", batch)
        _, out_packed = _apply(packed, "cinenet", batch, params)
        a, b = np.asarray(out_plain), np.asarray(out_packed)
        s = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(a / s, b / s, atol=5e-4)

    def test_trunk_block_override_matches(self, batch):
        """trunk_block=(2, 4) (beyond the auto rule) stays exact — the
        pack/phase-map machinery is generic over per-dim block factors."""
        kwargs = dict(CRNN_SMALL["varnet"])
        plain = build_model("varnet", "CRNN", **kwargs)
        big = build_model(
            "varnet", "CRNN", packed=True, trunk_block=(2, 4), **kwargs
        )
        params, out_plain = _apply(plain, "varnet", batch)
        _, out_big = _apply(big, "varnet", batch, params)
        a, b = np.asarray(out_plain), np.asarray(out_big)
        s = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(a / s, b / s, atol=5e-4)

    def test_xpdnet_crnn_packed_gradients_match(self, batch):
        """The packed-carry kernel-DC scan (recurrent._XPDNetRNNPackedStep)
        restructures the cascade loop itself, so gradient equality needs
        its own assertion (packed is the training default for CRNN)."""
        import jax

        kwargs = dict(CRNN_SMALL["xpdnet"])
        plain = build_model("xpdnet", "CRNN", **kwargs)
        packed = build_model("xpdnet", "CRNN", packed=True, **kwargs)
        k, m, _ = batch
        params = plain.init(jax.random.PRNGKey(0), k, m)
        g1 = jax.grad(lambda p: jnp.sum(plain.apply(p, k, m) ** 2))(params)
        g2 = jax.grad(lambda p: jnp.sum(packed.apply(p, k, m) ** 2))(params)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            s = np.abs(np.asarray(a)).max() + 1e-12
            np.testing.assert_allclose(
                np.asarray(a) / s, np.asarray(b) / s, atol=1e-3
            )


class TestBf16Mode:
    """bf16 activation mode: close to f32 outputs, f32 params/grads."""

    @pytest.mark.parametrize("family,dyn", [
        ("varnet", "XF"), ("varnet", "3D"), ("varnet", "CRNN"),
        ("cinenet", "3D"), ("cinenet", "CRNN"), ("xpdnet", "CRNN"),
        ("xpdnet", "XF"),
    ])
    def test_bf16_close_and_f32_grads(self, family, dyn, batch):
        kwargs = dict(CRNN_SMALL[family] if dyn == "CRNN" else SMALL[family])
        # xpdnet's bf16 mode normalizes the MWCNN buffer inputs (the fix
        # that certified it at 150 epochs, BASELINE.md) — a different
        # parameterization, not a rounding variation; compare against an
        # f32 model with the same norm_buffers setting so the remaining
        # delta is pure bf16 rounding.
        if family == "xpdnet" and dyn != "CRNN":
            kwargs["norm_buffers"] = True
        plain = build_model(family, dyn, **kwargs)
        half = build_model(family, dyn, bf16=True, **kwargs)
        params, out_plain = _apply(plain, family, batch)
        _, out_half = _apply(half, family, batch, params)
        a, b = np.asarray(out_plain), np.asarray(out_half)
        assert b.dtype == np.float32
        s = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(a / s, b / s, atol=0.05)
        assert np.abs(a - b).mean() / s < 1e-2  # close on average

        k, m, sens = batch
        args = (k, m, sens) if family == "cinenet" else (k, m)
        g = jax.grad(lambda p: jnp.sum(half.apply(p, *args)))(params)
        for leaf in jax.tree.leaves(g):
            assert leaf.dtype == jnp.float32

    def test_xpdnet_norm_buffers_default_resolution(self, batch):
        """norm_buffers=None resolves to the bf16 flag: f32 default keeps
        the reference's raw-buffer semantics exactly; bf16 default equals
        an explicit norm_buffers=True model (the certified combination)."""
        kwargs = dict(SMALL["xpdnet"])
        k, m, _ = batch

        plain = build_model("xpdnet", "XF", **kwargs)
        raw = build_model("xpdnet", "XF", norm_buffers=False, **kwargs)
        params, out_plain = _apply(plain, "xpdnet", batch)
        _, out_raw = _apply(raw, "xpdnet", batch, params)
        np.testing.assert_array_equal(np.asarray(out_plain), np.asarray(out_raw))

        half = build_model("xpdnet", "XF", bf16=True, **kwargs)
        half_norm = build_model(
            "xpdnet", "XF", bf16=True, norm_buffers=True, **kwargs
        )
        _, out_half = _apply(half, "xpdnet", batch, params)
        _, out_half_norm = _apply(half_norm, "xpdnet", batch, params)
        np.testing.assert_array_equal(
            np.asarray(out_half), np.asarray(out_half_norm)
        )

        # and the normalization is load-bearing: structurally different
        # from the raw-buffer function at the same params
        normed = build_model("xpdnet", "XF", norm_buffers=True, **kwargs)
        _, out_normed = _apply(normed, "xpdnet", batch, params)
        assert np.abs(np.asarray(out_normed) - np.asarray(out_plain)).max() > 1e-4

    @pytest.mark.parametrize("dyn", ["XF", "XT"])
    def test_norm_buffers_single_frame_finite(self, dyn):
        """t=1 volumes (reachable via --n_slices 1) make every XF/XT plane
        constant after temporal-mean subtraction; the norm_buffers stats
        must guard std=0 instead of emitting 0/0 NaN."""
        rng = np.random.default_rng(0)
        t, c, h, w = 1, 2, 16, 16
        k = (rng.standard_normal((1, t, c, h, w))
             + 1j * rng.standard_normal((1, t, c, h, w))).astype(np.complex64)
        m = np.zeros((1, t, 1, h, 1), np.float32)
        m[:, :, :, h // 2 - 3 : h // 2 + 3] = 1
        m[:, :, :, 2] = 1
        m[:, :, :, h - 3] = 1
        km, mj = from_complex(k * m), jnp.asarray(m)
        model = build_model("xpdnet", dyn, norm_buffers=True, **SMALL["xpdnet"])
        params = model.init(jax.random.PRNGKey(0), km, mj)
        out = np.asarray(model.apply(params, km, mj))
        assert np.isfinite(out).all()


class TestNormalBackendPallas:
    """set_normal_backend('pallas') end-to-end: fused normal apply inside
    full models (CG and collapsed-DC paths), interpret mode on CPU."""

    def _with_pallas(self, fn):
        import cinemri_tpu.ops.kernels.normal_pallas as NP
        import cinemri_tpu.physics.operators as O

        old = NP._INTERPRET
        try:
            NP._INTERPRET = True
            O.set_normal_backend("pallas")
            return fn()
        finally:
            NP._INTERPRET = old
            O.set_normal_backend("xla")

    @pytest.mark.parametrize("family,dyn", [("cinenet", "XF"), ("varnet", "XF")])
    def test_forward_and_grads_match_xla_backend(self, family, dyn, batch):
        kwargs = dict(SMALL[family], num_cascades=1)
        model = build_model(family, dyn, kernel_dc=True, **kwargs)
        k, m, sens = batch
        args = (k, m, sens) if family == "cinenet" else (k, m)
        params = model.init(jax.random.PRNGKey(0), *args)
        target = k.abs().mean(axis=2)

        def fwd():
            return np.asarray(model.apply(params, *args))

        def grads():
            def loss_fn(p):
                return ssim_loss(model.apply(p, *args), target)

            g = jax.grad(loss_fn)(params)
            return [np.asarray(x) for x in jax.tree.leaves(g)]

        np.testing.assert_allclose(
            self._with_pallas(fwd), fwd(), rtol=1e-4, atol=1e-5
        )
        for gp, gx in zip(self._with_pallas(grads), grads()):
            np.testing.assert_allclose(gp, gx, rtol=2e-3, atol=2e-4)
