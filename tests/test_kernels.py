"""Pallas kernel tests (interpret mode on the CPU suite; compiled on TPU)."""

import numpy as np
import pytest

from cinemri_tpu.ops.kernels.dft_pallas import complex_dft_matmul_pallas


class TestComplexDFTKernel:
    def test_matches_numpy_complex_product(self, rng):
        import jax.numpy as jnp

        b, n = 37, 64  # non-multiple of the row tile exercises padding
        x = (rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))).astype(np.complex64)
        w = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))).astype(np.complex64)
        yr, yi = complex_dft_matmul_pallas(
            jnp.asarray(x.real), jnp.asarray(x.imag),
            w.real.astype(np.float32), w.imag.astype(np.float32),
            interpret=True,
        )
        got = np.asarray(yr) + 1j * np.asarray(yi)
        want = x @ w.T.astype(np.complex64)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_fft_backend_switch_roundtrip(self, rng):
        """set_dft_backend('pallas') must keep fft2c/ifft2c a true inverse
        pair (interpret mode on CPU)."""
        import cinemri_tpu.ops.fft as F
        import cinemri_tpu.ops.kernels.dft_pallas as K
        from cinemri_tpu.ops.cplx import from_complex, to_numpy

        x = (rng.standard_normal((2, 3, 32, 32)) + 1j * rng.standard_normal((2, 3, 32, 32))).astype(np.complex64)
        old_tile = K._ROW_TILE
        try:
            orig = K.complex_dft_matmul_pallas
            K.complex_dft_matmul_pallas = lambda *a, **kw: orig(*a, interpret=True)
            F.set_dft_backend("pallas")
            back = to_numpy(F.ifft2c(F.fft2c(from_complex(x))))
        finally:
            K.complex_dft_matmul_pallas = orig
            K._ROW_TILE = old_tile
            F.set_dft_backend("xla")
        np.testing.assert_allclose(back, x, rtol=2e-3, atol=2e-3)


class TestFusedFFT2Kernel:
    def test_matches_numpy_fft2(self, rng):
        import cinemri_tpu.ops.fft as F
        from cinemri_tpu.ops.kernels.fft2_pallas import fft2_plane_pallas
        import jax.numpy as jnp

        n = 32
        x = (rng.standard_normal((3, n, n)) + 1j * rng.standard_normal((3, n, n))).astype(np.complex64)
        wh = F._dft_matrix(n, False, False, "ortho")
        yr, yi = fft2_plane_pallas(
            jnp.asarray(x.real), jnp.asarray(x.imag), wh, wh, interpret=True
        )
        got = np.asarray(yr) + 1j * np.asarray(yi)
        want = np.fft.fftshift(
            np.fft.fft2(np.fft.ifftshift(x, axes=(-2, -1)), norm="ortho"),
            axes=(-2, -1),
        )
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


class TestNormalApplyKernel:
    """Fused pallas normal-operator apply vs the XLA einsum path."""

    def _setup(self, rng, b=2, t=3, c=4, h=24, w=20, per_frame=True):
        import jax.numpy as jnp
        from cinemri_tpu.ops.cplx import Complex
        from cinemri_tpu.physics.operators import masked_normal_kernel

        def c64(*shape):
            return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)

        x = c64(b, t, 1, h, w)
        s = c64(b, 1, c, h, w)
        kt = t if per_frame else 1
        mask = (rng.random((b, kt, 1, h, 1)) < 0.4).astype(np.float32)
        kern = masked_normal_kernel(jnp.asarray(mask))
        xc = Complex(jnp.asarray(x.real), jnp.asarray(x.imag))
        sc = Complex(jnp.asarray(s.real), jnp.asarray(s.imag))
        return xc, sc, kern

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

    @pytest.mark.parametrize("per_frame", [True, False])
    def test_forward_matches_xla(self, rng, per_frame):
        from cinemri_tpu.ops.cplx import to_numpy
        from cinemri_tpu.physics.operators import normal_plus_lambda_kernel

        x, s, kern = self._setup(rng, per_frame=per_frame)
        want = to_numpy(normal_plus_lambda_kernel(x, kern, s, 0.37))
        got = self._with_pallas(
            lambda: to_numpy(normal_plus_lambda_kernel(x, kern, s, 0.37))
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("b", [1, 2])
    def test_gradients_match_xla(self, rng, b):
        """x-, sens- and lam-cotangents agree with autodiff of the XLA path
        (b=2 exercises the sens-cotangent's cross-frame accumulation
        restarting at each batch row)."""
        import jax
        import jax.numpy as jnp
        from cinemri_tpu.physics.operators import normal_plus_lambda_kernel

        x, s, kern = self._setup(rng, b=b, t=2, c=3, h=16, w=12)
        gr = jnp.asarray(np.random.default_rng(7).standard_normal(x.shape), jnp.float32)
        gi = jnp.asarray(np.random.default_rng(8).standard_normal(x.shape), jnp.float32)

        def loss(xre, xim, sre, sim, lam):
            from cinemri_tpu.ops.cplx import Complex

            out = normal_plus_lambda_kernel(
                Complex(xre, xim), kern, Complex(sre, sim), lam
            )
            return jnp.sum(out.re * gr) + jnp.sum(out.im * gi)

        args = (x.re, x.im, s.re, s.im, jnp.float32(0.21))
        want = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
        got = self._with_pallas(
            lambda: jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
        )
        for g, w_ in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w_), rtol=2e-4, atol=2e-4)

    def test_vmem_guard_falls_back(self, rng):
        """Shapes past the VMEM guard must take the XLA path (and still work)."""
        import cinemri_tpu.ops.kernels.normal_pallas as NP
        from cinemri_tpu.ops.cplx import to_numpy
        from cinemri_tpu.physics.operators import normal_plus_lambda_kernel

        x, s, kern = self._setup(rng)
        want = to_numpy(normal_plus_lambda_kernel(x, kern, s, 0.0))
        old_guard = NP.NORMAL_VMEM_GUARD_BYTES
        try:
            NP.NORMAL_VMEM_GUARD_BYTES = 0  # nothing is eligible

            def run():
                # forcing pallas on: guard must reroute to XLA, not crash
                return to_numpy(normal_plus_lambda_kernel(x, kern, s, 0.0))

            got = self._with_pallas(run)
        finally:
            NP.NORMAL_VMEM_GUARD_BYTES = old_guard
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
