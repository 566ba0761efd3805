"""Unit tests for the numerics core (ops/) against numpy/scipy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import uniform_filter

from cinemri_tpu import ops
from cinemri_tpu.ops.cplx import Complex, from_complex, to_numpy


def _crandn(rng, *shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        np.complex64
    )


class TestFFT:
    def test_fft2c_matches_numpy(self, rng):
        x = _crandn(rng, 3, 10, 12)
        got = np.asarray(ops.fft2c(jnp.asarray(x)))
        want = np.fft.fftshift(
            np.fft.fft2(np.fft.ifftshift(x, axes=(-2, -1)), norm="ortho"),
            axes=(-2, -1),
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_ifft2c_roundtrip(self, rng):
        x = _crandn(rng, 2, 9, 11)  # odd sizes exercise the shift conventions
        got = np.asarray(ops.ifft2c(ops.fft2c(jnp.asarray(x))))
        np.testing.assert_allclose(got, x, rtol=1e-4, atol=1e-5)

    def test_fft1c_matches_numpy_odd_length(self, rng):
        x = _crandn(rng, 4, 15)
        got = np.asarray(ops.fft1c(jnp.asarray(x), axis=-1))
        want = np.fft.fftshift(
            np.fft.fft(np.fft.ifftshift(x, axes=-1), norm="ortho"), axes=-1
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_fft1c_alt_differs_for_odd_and_roundtrips(self, rng):
        # XPDNet's temporal FFT uses the opposite shift order
        # (reference xpdnet.py:467); for odd lengths it differs from fft1c.
        x = _crandn(rng, 3, 15)
        a = np.asarray(ops.fft1c(jnp.asarray(x), axis=-1))
        b = np.asarray(ops.fft1c_alt(jnp.asarray(x), axis=-1))
        assert not np.allclose(a, b)
        back = np.asarray(ops.ifft1c_alt(ops.fft1c_alt(jnp.asarray(x), axis=-1), axis=-1))
        np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-5)

    def test_parseval(self, rng):
        x = _crandn(rng, 5, 16, 16)
        k = ops.fft2c(jnp.asarray(x))
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(k)), np.linalg.norm(x), rtol=1e-5
        )


class TestMatmulDFT:
    """The Complex-pair path computes centered transforms as DFT matmuls;
    it must agree with numpy's FFT to float32 precision."""

    @pytest.mark.parametrize("n", [15, 16, 200])
    def test_fft1c_complex_pair_matches_numpy(self, rng, n):
        x = _crandn(rng, 3, n)
        got = to_numpy(ops.fft1c(from_complex(x), axis=-1))
        want = np.fft.fftshift(
            np.fft.fft(np.fft.ifftshift(x, axes=-1), norm="ortho"), axes=-1
        )
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_fft2c_complex_pair_roundtrip_and_match(self, rng):
        x = _crandn(rng, 2, 24, 18)
        c = from_complex(x)
        k = ops.fft2c(c)
        want = np.fft.fftshift(
            np.fft.fft2(np.fft.ifftshift(x, axes=(-2, -1)), norm="ortho"),
            axes=(-2, -1),
        )
        np.testing.assert_allclose(to_numpy(k), want, rtol=1e-3, atol=1e-4)
        back = to_numpy(ops.ifft2c(k))
        np.testing.assert_allclose(back, x, rtol=1e-3, atol=1e-4)

    def test_alt_convention_complex_pair(self, rng):
        x = _crandn(rng, 4, 15)
        got = to_numpy(ops.fft1c_alt(from_complex(x), axis=-1))
        want = np.fft.ifftshift(
            np.fft.fft(np.fft.fftshift(x, axes=-1), norm="ortho"), axes=-1
        )
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
        back = to_numpy(ops.ifft1c_alt(ops.fft1c_alt(from_complex(x), axis=-1), axis=-1))
        np.testing.assert_allclose(back, x, rtol=1e-3, atol=1e-4)

    def test_backward_norm(self, rng):
        x = _crandn(rng, 2, 16, 16)
        got = to_numpy(ops.ifft2c(from_complex(x), norm="backward"))
        want = np.fft.fftshift(
            np.fft.ifft2(np.fft.ifftshift(x, axes=(-2, -1))), axes=(-2, -1)
        )
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


class TestComplexPair:
    def test_arithmetic(self, rng):
        a = _crandn(rng, 3, 4)
        b = _crandn(rng, 3, 4)
        ca, cb = from_complex(a), from_complex(b)
        np.testing.assert_allclose(to_numpy(ca * cb), a * b, rtol=1e-5)
        np.testing.assert_allclose(to_numpy(ca + cb), a + b, rtol=1e-5)
        np.testing.assert_allclose(to_numpy(ca - cb), a - b, rtol=1e-5)
        np.testing.assert_allclose(to_numpy(ca.conj()), a.conj(), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ca.abs()), np.abs(a), rtol=1e-5)
        np.testing.assert_allclose(to_numpy(ca / cb), a / b, rtol=1e-4)

    def test_real_broadcast_and_pytree(self, rng):
        import jax

        a = _crandn(rng, 2, 3)
        m = rng.random((2, 3)).astype(np.float32)
        ca = from_complex(a)
        np.testing.assert_allclose(to_numpy(jnp.asarray(m) * ca), m * a, rtol=1e-5)
        np.testing.assert_allclose(to_numpy(ca * 2.0), a * 2.0, rtol=1e-5)
        leaves = jax.tree.leaves(ca)
        assert len(leaves) == 2  # registered pytree

    def test_shape_ops(self, rng):
        a = _crandn(rng, 2, 3, 4)
        ca = from_complex(a)
        np.testing.assert_allclose(to_numpy(ca.transpose(2, 0, 1)), a.transpose(2, 0, 1))
        np.testing.assert_allclose(to_numpy(ca.reshape(6, 4)), a.reshape(6, 4))
        np.testing.assert_allclose(to_numpy(ca[..., 1]), a[..., 1])
        np.testing.assert_allclose(to_numpy(ca[:, None]), a[:, None])

    def test_multi_channel_packing(self, rng):
        from cinemri_tpu.ops.cplx import from_multi_channels, to_multi_channels

        a = _crandn(rng, 2, 5, 3)
        packed = to_multi_channels(from_complex(a))
        np.testing.assert_allclose(np.asarray(packed[..., :3]), a.real, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(packed[..., 3:]), a.imag, rtol=1e-6)
        np.testing.assert_allclose(to_numpy(from_multi_channels(packed)), a, rtol=1e-6)


class TestComplexLayout:
    def test_real2_roundtrip(self, rng):
        x = _crandn(rng, 3, 4)
        r = ops.to_real2(jnp.asarray(x))
        assert r.shape == (3, 4, 2)
        np.testing.assert_allclose(np.asarray(ops.from_real2(r)), x)

    def test_multi_channel_packing(self, rng):
        x = _crandn(rng, 2, 5, 3)  # 3 complex channels
        packed = ops.split_to_real_channels(jnp.asarray(x))
        assert packed.shape == (2, 5, 6)
        # first n = real parts, last n = imag parts (reference math.py:121-135)
        np.testing.assert_allclose(np.asarray(packed[..., :3]), x.real)
        np.testing.assert_allclose(np.asarray(packed[..., 3:]), x.imag)
        back = ops.merge_real_channels(packed, 3)
        np.testing.assert_allclose(np.asarray(back), x)

    def test_rss_complex(self, rng):
        x = _crandn(rng, 4, 6, 6)
        got = np.asarray(ops.rss_complex(jnp.asarray(x), axis=0))
        want = np.sqrt((np.abs(x) ** 2).sum(axis=0))
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestPadding:
    @pytest.mark.parametrize("h,w", [(150, 150), (177, 201), (16, 16), (15, 17)])
    def test_pad_to_multiple_roundtrip(self, rng, h, w):
        x = jnp.asarray(rng.standard_normal((2, h, w)).astype(np.float32))
        padded, spec = ops.pad_to_multiple(x, 16, axes=(-2, -1))
        assert padded.shape[-2] % 16 == 0 and padded.shape[-1] % 16 == 0
        back = ops.unpad(padded, spec, axes=(-2, -1))
        np.testing.assert_allclose(np.asarray(back), np.asarray(x))

    @pytest.mark.parametrize("h,w,n", [(150, 150, 3), (201, 207, 3), (15, 22, 2)])
    def test_pad_for_mwcnn_matches_reference_semantics(self, rng, h, w, n):
        x = jnp.asarray(rng.standard_normal((2, 4, h, w)).astype(np.float32))
        padded, pad = ops.pad_for_mwcnn(x, n)
        block = 2 ** n
        assert padded.shape[-1] % block == 0 and padded.shape[-2] % block == 0
        # reference padding.py:38-44: odd dims put the extra sample on the left
        for dim, (lo, hi) in [(w, (pad[0], pad[1])), (h, (pad[2], pad[3]))]:
            n_pad = 0 if dim % block == 0 else (dim // block + 1) * block - dim
            assert lo + hi == n_pad
            if n_pad and dim % 2 == 1:
                assert lo == 1 + n_pad // 2
        back = ops.unpad_from_mwcnn(padded, pad)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x))


class TestWavelet:
    def test_dwt_iwt_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 16, 20, 3)).astype(np.float32))
        y = ops.dwt2(x)
        assert y.shape == (2, 8, 10, 12)
        back = ops.iwt2(y)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)

    def test_dwt_matches_direct_haar(self, rng):
        x = rng.standard_normal((1, 4, 4, 1)).astype(np.float32)
        y = np.asarray(ops.dwt2(jnp.asarray(x)))
        v = x[0, :, :, 0]
        x1 = v[0::2, 0::2] / 2
        x2 = v[1::2, 0::2] / 2
        x3 = v[0::2, 1::2] / 2
        x4 = v[1::2, 1::2] / 2
        np.testing.assert_allclose(y[0, :, :, 0], x1 + x2 + x3 + x4, atol=1e-6)
        np.testing.assert_allclose(y[0, :, :, 1], -x1 - x2 + x3 + x4, atol=1e-6)
        np.testing.assert_allclose(y[0, :, :, 2], -x1 + x2 - x3 + x4, atol=1e-6)
        np.testing.assert_allclose(y[0, :, :, 3], x1 - x2 - x3 + x4, atol=1e-6)

    def test_packed_dwt_equals_dense(self, rng):
        """dwt2_from_packed(pack(x)) == dwt2(x): the phase-space butterfly
        (ops/wavelet.py) matches the dense path exactly."""
        from cinemri_tpu.models.denoisers.packed_unet import pack
        from cinemri_tpu.ops.wavelet import dwt2_from_packed

        x = jnp.asarray(rng.standard_normal((2, 16, 20, 3)).astype(np.float32))
        want = np.asarray(ops.dwt2(x))
        got = np.asarray(dwt2_from_packed(pack(x, (2, 2))))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_packed_iwt_equals_dense(self, rng):
        from cinemri_tpu.models.denoisers.packed_unet import pack
        from cinemri_tpu.ops.wavelet import iwt2_to_packed

        y = jnp.asarray(rng.standard_normal((2, 8, 10, 12)).astype(np.float32))
        want = np.asarray(pack(ops.iwt2(y), (2, 2)))
        got = np.asarray(iwt2_to_packed(y))
        np.testing.assert_allclose(got, want, atol=1e-6)


def _ssim_oracle_frame(x, y, drange, win=7, k1=0.01, k2=0.03):
    """Direct numpy oracle for the training-loss SSIM of one frame (VALID conv)."""
    np_ = win * win
    cov_norm = np_ / (np_ - 1)

    def valid_mean(im):
        full = uniform_filter(im, size=win, mode="constant")
        pad = win // 2
        return full[pad:-pad, pad:-pad]

    ux, uy = valid_mean(x), valid_mean(y)
    uxx, uyy, uxy = valid_mean(x * x), valid_mean(y * y), valid_mean(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1, c2 = (k1 * drange) ** 2, (k2 * drange) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux ** 2 + uy ** 2 + c1) * (vx + vy + c2)
    )
    return s.mean()


class TestSSIMLoss:
    def test_matches_numpy_oracle(self, rng):
        b, t, h, w = 1, 4, 24, 26
        x = rng.random((b, t, h, w)).astype(np.float32)
        y = rng.random((b, t, h, w)).astype(np.float32)
        got = float(ops.ssim_loss(jnp.asarray(x), jnp.asarray(y)))
        want = np.mean(
            [
                1.0
                - _ssim_oracle_frame(
                    x[0, i].astype(np.float64),
                    y[0, i].astype(np.float64),
                    y[0, i].max(),  # per-frame target max (losses.py:34)
                )
                for i in range(t)
            ]
        )
        np.testing.assert_allclose(got, want, rtol=2e-4)

    def test_identical_images_give_zero(self, rng):
        x = rng.random((1, 3, 20, 20)).astype(np.float32)
        loss = float(ops.ssim_loss(jnp.asarray(x), jnp.asarray(x)))
        assert abs(loss) < 1e-5

    def test_is_differentiable(self, rng):
        import jax

        x = jnp.asarray(rng.random((1, 2, 16, 16)).astype(np.float32))
        y = jnp.asarray(rng.random((1, 2, 16, 16)).astype(np.float32))
        g = jax.grad(lambda p: ops.ssim_loss(p, y))(x)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestEvalMetrics:
    def test_psnr_definition(self, rng):
        gt = rng.random((3, 8, 8)).astype(np.float32)
        pred = gt + 0.1 * rng.standard_normal((3, 8, 8)).astype(np.float32)
        err = np.mean((gt - pred) ** 2)
        want = 10 * np.log10(gt.max() ** 2 / err)
        np.testing.assert_allclose(ops.metrics.psnr(gt, pred), want, rtol=1e-6)

    def test_nmse(self, rng):
        gt = rng.random((4, 4))
        pred = gt * 1.1
        want = np.linalg.norm(gt - pred) ** 2 / np.linalg.norm(gt) ** 2
        np.testing.assert_allclose(ops.metrics.nmse(gt, pred), want, rtol=1e-6)

    def test_ssim2d_perfect_is_one(self, rng):
        x = rng.random((32, 32))
        assert ops.metrics.ssim2d(x, x, data_range=x.max()) == pytest.approx(1.0)

    def test_ssim_volume_averages_frames(self, rng):
        gt = rng.random((3, 32, 32)).astype(np.float32)
        pred = gt + 0.05 * rng.standard_normal((3, 32, 32)).astype(np.float32)
        per_frame = [
            ops.metrics.ssim2d(gt[i], pred[i], data_range=gt.max()) for i in range(3)
        ]
        np.testing.assert_allclose(
            ops.metrics.ssim(gt, pred), np.mean(per_frame), rtol=1e-10
        )

    def test_ssim2d_tracks_degradation(self, rng):
        gt = rng.random((40, 40))
        a = ops.metrics.ssim2d(gt, gt + 0.01, data_range=1.0)
        b = ops.metrics.ssim2d(gt, gt + 0.3 * rng.standard_normal((40, 40)), data_range=1.0)
        assert a > b
