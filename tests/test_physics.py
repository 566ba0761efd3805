"""Property tests for the MRI operator algebra (adjointness, DC, CG)."""

import jax
import jax.numpy as jnp
import numpy as np

from cinemri_tpu import physics
from cinemri_tpu.ops.cplx import Complex, from_complex, to_numpy


def _crandn(rng, *shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        np.complex64
    )


def _setup(rng, b=1, t=3, c=4, h=16, w=18):
    image = from_complex(_crandn(rng, b, t, 1, h, w))
    kspace = from_complex(_crandn(rng, b, t, c, h, w))
    sens = from_complex(_crandn(rng, b, 1, c, h, w))
    mask = jnp.asarray((rng.random((b, t, 1, h, 1)) > 0.5).astype(np.float32))
    return image, kspace, sens, mask


def _inner(u, v):
    return complex(np.sum(to_numpy(u) * np.conj(to_numpy(v))))


class TestAdjointness:
    def test_sens_expand_reduce_adjoint(self, rng):
        """⟨A x, y⟩ = ⟨x, Aᴴ y⟩ for A = sens_expand, Aᴴ = sens_reduce."""
        image, kspace, sens, _ = _setup(rng)
        lhs = _inner(physics.sens_expand(image, sens), kspace)
        rhs = _inner(image, physics.sens_reduce(kspace, sens, keepdims=True))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-4)

    def test_masked_operator_adjoint(self, rng):
        image, kspace, sens, mask = _setup(rng)
        ax = physics.apply_mask(physics.sens_expand(image, sens), mask)
        aty = physics.sens_reduce(physics.apply_mask(kspace, mask), sens)
        np.testing.assert_allclose(_inner(ax, kspace), _inner(image, aty), rtol=1e-4)


class TestSoftDC:
    def test_limits(self, rng):
        """v→∞ forces sampled lines to ref; v→0 keeps the model term."""
        image, kspace, sens, mask = _setup(rng)
        model_term = physics.sens_expand(image, sens)
        big = physics.soft_dc(model_term, kspace, mask, jnp.asarray(1e8))
        np.testing.assert_allclose(
            to_numpy(big * mask), to_numpy(kspace * mask), rtol=1e-3, atol=1e-4
        )
        small = physics.soft_dc(model_term, kspace, mask, jnp.asarray(0.0))
        np.testing.assert_allclose(
            to_numpy(small), to_numpy(model_term), rtol=1e-5, atol=1e-6
        )

    def test_unsampled_lines_keep_model_term(self, rng):
        image, kspace, sens, mask = _setup(rng)
        model_term = physics.sens_expand(image, sens)
        out = physics.soft_dc(model_term, kspace, mask, jnp.asarray(1.0))
        inv = 1 - np.asarray(mask)
        np.testing.assert_allclose(
            to_numpy(out) * inv, to_numpy(model_term) * inv, rtol=1e-5, atol=1e-6
        )


class TestCG:
    def test_solves_spd_system(self, rng):
        """CG on H = AᴴMA + λI converges to the true solution."""
        image, _, sens, mask = _setup(rng, t=2, c=3, h=12, w=12)
        lam = jnp.asarray(0.5)
        op = lambda x: physics.normal_plus_lambda(x, mask, sens, lam)
        x_true = image
        rhs = op(x_true)
        x0 = Complex(jnp.zeros_like(x_true.re), jnp.zeros_like(x_true.im))
        x = physics.conj_grad(op, rhs, x0, iters=120)
        rel = float(
            np.linalg.norm(to_numpy(x) - to_numpy(x_true)) / np.linalg.norm(to_numpy(x_true))
        )
        assert rel < 1e-3

    def test_residual_decreases_monotonically_early(self, rng):
        image, _, sens, mask = _setup(rng, t=2, c=3, h=12, w=12)
        lam = jnp.asarray(1.0)
        op = lambda x: physics.normal_plus_lambda(x, mask, sens, lam)
        rhs = op(image)
        x0 = Complex(jnp.zeros_like(image.re), jnp.zeros_like(image.im))
        res = []
        for iters in (1, 3, 6, 12):
            x = physics.conj_grad(op, rhs, x0, iters=iters)
            res.append(float(np.linalg.norm(to_numpy(op(x)) - to_numpy(rhs))))
        assert res[0] > res[1] > res[2] > res[3]

    def test_jittable_and_differentiable(self, rng):
        image, _, sens, mask = _setup(rng, t=1, c=2, h=8, w=8)

        def solve(lam):
            op = lambda x: physics.normal_plus_lambda(x, mask, sens, lam)
            x0 = Complex(jnp.zeros_like(image.re), jnp.zeros_like(image.im))
            x = physics.conj_grad(op, image, x0, iters=6)
            return jnp.sum(x.abs_sq())

        g = jax.grad(solve)(jnp.asarray(0.7))
        assert np.isfinite(float(g))


class TestNormalKernel:
    """masked_normal_kernel collapses FhᴴMFh into one h×h matrix; the
    kernelized operator must match the direct 4-DFT-pass one exactly."""

    def test_matches_direct_operator(self, rng):
        image, _, sens, mask = _setup(rng)
        lam = jnp.asarray(0.3)
        direct = physics.normal_plus_lambda(image, mask, sens, lam)
        kern = physics.masked_normal_kernel(mask)
        fast = physics.normal_plus_lambda_kernel(image, kern, sens, lam)
        np.testing.assert_allclose(
            to_numpy(fast), to_numpy(direct), rtol=1e-4, atol=1e-4
        )

    def test_broadcast_frame_mask(self, rng):
        """Equispaced masks carry t=1; the kernel must broadcast over frames."""
        image, _, sens, mask = _setup(rng)
        mask1 = mask[:, :1]
        lam = jnp.asarray(0.7)
        direct = physics.normal_plus_lambda(image, mask1, sens, lam)
        fast = physics.normal_plus_lambda_kernel(
            image, physics.masked_normal_kernel(mask1), sens, lam
        )
        np.testing.assert_allclose(
            to_numpy(fast), to_numpy(direct), rtol=1e-4, atol=1e-4
        )

    def test_is_line_mask(self, rng):
        _, _, _, mask = _setup(rng)
        assert physics.is_line_mask(mask)
        assert physics.is_line_mask(mask[:, :1])
        assert not physics.is_line_mask(jnp.ones((1, 3, 1, 16, 18)))

    def test_cg_solution_matches_direct(self, rng):
        """6 CG iterations through the kernel operator land on the same
        iterate as through the direct operator (CineNet DC parity)."""
        image, _, sens, mask = _setup(rng, t=2, c=3, h=12, w=12)
        lam = jnp.asarray(0.5)
        x0 = Complex(jnp.zeros_like(image.re), jnp.zeros_like(image.im))
        op_d = lambda x: physics.normal_plus_lambda(x, mask, sens, lam)
        kern = physics.masked_normal_kernel(mask)
        op_k = lambda x: physics.normal_plus_lambda_kernel(x, kern, sens, lam)
        xd = physics.conj_grad(op_d, image, x0, iters=6)
        xk = physics.conj_grad(op_k, image, x0, iters=6)
        np.testing.assert_allclose(to_numpy(xk), to_numpy(xd), rtol=1e-3, atol=1e-4)


class TestLowFreq:
    def _mask_with_band(self, h, pad, width, t=3):
        m = np.zeros((1, t, 1, h, 1), np.float32)
        m[:, :, :, pad : pad + width] = 1.0
        # sprinkle random sampled lines outside the band (frame-varying)
        m[0, 0, 0, 1, 0] = 1.0
        m[0, 1, 0, h - 2, 0] = 1.0
        return jnp.asarray(m)

    def test_center_band_detection(self):
        h = 32
        mask = self._mask_with_band(h, pad=12, width=8)
        pad, num_low = physics.center_band(mask)
        # reference semantics (varnet.py:63-68): num_low = right_zero - left_zero
        # where left is the last zero before center (11) and right the first
        # zero at/after center (20) — i.e. band width 8 reads as 9, an
        # off-by-one inherited from the reference.
        assert int(num_low) == 9
        assert int(pad) == (h - 9 + 1) // 2

    def test_low_frequency_kspace_keeps_only_band(self, rng):
        h = 32
        mask = self._mask_with_band(h, pad=12, width=8)
        k = from_complex(_crandn(rng, 1, 3, 2, h, 16))
        out = to_numpy(physics.low_frequency_kspace(k, mask))
        assert out.shape == (1, 2, h, 16)
        pad, num_low = physics.center_band(mask)
        p, n = int(pad), int(num_low)
        assert np.abs(out[:, :, :p]).max() == 0
        assert np.abs(out[:, :, p + n :]).max() == 0
        want = to_numpy(k).mean(axis=1)[:, :, p : p + n]
        np.testing.assert_allclose(out[:, :, p : p + n], want, rtol=1e-5)

    def test_center_band_inside_jit(self):
        mask = self._mask_with_band(24, pad=9, width=6)

        @jax.jit
        def f(m):
            pad, nl = physics.center_band(m)
            return pad + nl

        assert np.isfinite(float(f(mask)))


class TestSoftDCImageKernel:
    def test_matches_direct_round_trip(self, rng):
        """R0*z - a*N(z) + a*x_ref == sens_reduce(soft_dc(sens_expand(z)))
        for both per-frame and broadcast (equispaced-style) line masks."""
        image, kspace, sens, mask = _setup(rng)
        for m in (mask, mask[:, :1]):
            k_ref = physics.apply_mask(kspace, m)
            v = jnp.asarray(0.7)
            direct = physics.sens_reduce(
                physics.soft_dc(physics.sens_expand(image, sens), k_ref, m, v),
                sens,
            )
            kern = physics.masked_normal_kernel(m)
            x_ref = physics.sens_reduce(k_ref, sens)
            fast = physics.soft_dc_image_kernel(image, x_ref, kern, sens, v)
            np.testing.assert_allclose(
                to_numpy(fast), to_numpy(direct), rtol=1e-4, atol=1e-4
            )


class TestNormalBackendSelection:
    def test_auto_resolves_xla_on_cpu(self):
        import cinemri_tpu.physics.operators as O

        try:
            O.set_normal_backend("auto")
            assert O._resolve_normal_backend() == "xla"
        finally:
            O.set_normal_backend("xla")

    def test_rejects_unknown_backend(self):
        import cinemri_tpu.physics.operators as O
        import pytest as _pytest

        with _pytest.raises(ValueError):
            O.set_normal_backend("cuda")
