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
