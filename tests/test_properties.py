"""Property-based tests (hypothesis) for the numerics core.

Randomized shapes/values catch layout and convention bugs that fixed-shape
unit tests miss — especially odd/even interactions in the centered-shift
conventions and the padding helpers.
"""

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from cinemri_tpu import ops
from cinemri_tpu.ops.cplx import Complex, from_complex, to_numpy

SETTINGS = dict(max_examples=25, deadline=None)


def _carr(data, *shape):
    re = data.draw(
        st.lists(
            st.floats(-10, 10, allow_nan=False, width=32),
            min_size=int(np.prod(shape)),
            max_size=int(np.prod(shape)),
        )
    )
    im = data.draw(
        st.lists(
            st.floats(-10, 10, allow_nan=False, width=32),
            min_size=int(np.prod(shape)),
            max_size=int(np.prod(shape)),
        )
    )
    return (np.asarray(re) + 1j * np.asarray(im)).reshape(shape).astype(np.complex64)


class TestFFTProperties:
    @settings(**SETTINGS)
    @given(n=st.integers(4, 48), data=st.data())
    def test_fft1c_roundtrip_any_length(self, n, data):
        x = _carr(data, 2, n)
        back = to_numpy(ops.ifft1c(ops.fft1c(from_complex(x), axis=-1), axis=-1))
        np.testing.assert_allclose(back, x, rtol=1e-3, atol=1e-3)

    @settings(**SETTINGS)
    @given(h=st.integers(4, 24), w=st.integers(4, 24), data=st.data())
    def test_fft2c_parseval_any_shape(self, h, w, data):
        x = _carr(data, 1, h, w)
        k = to_numpy(ops.fft2c(from_complex(x)))
        np.testing.assert_allclose(
            np.linalg.norm(k), np.linalg.norm(x), rtol=1e-3, atol=1e-3
        )

    @settings(**SETTINGS)
    @given(n=st.integers(4, 32), data=st.data())
    def test_matmul_dft_matches_native_fft(self, n, data):
        x = _carr(data, 3, n)
        got = to_numpy(ops.fft1c(from_complex(x), axis=-1))
        want = np.asarray(ops.fft1c(jnp.asarray(x), axis=-1))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


class TestPaddingProperties:
    @settings(**SETTINGS)
    @given(
        h=st.integers(3, 60),
        w=st.integers(3, 60),
        mult=st.sampled_from([4, 8, 16]),
    )
    def test_pad_to_multiple_invariants(self, h, w, mult):
        x = jnp.ones((1, h, w))
        padded, spec = ops.pad_to_multiple(x, mult, axes=(-2, -1))
        assert padded.shape[-2] % mult == 0 and padded.shape[-1] % mult == 0
        assert padded.shape[-2] - h < mult and padded.shape[-1] - w < mult
        back = ops.unpad(padded, spec, axes=(-2, -1))
        assert back.shape == x.shape

    @settings(**SETTINGS)
    @given(h=st.integers(4, 60), w=st.integers(4, 60), n=st.integers(1, 3))
    def test_mwcnn_pad_roundtrip(self, h, w, n):
        x = jnp.arange(h * w, dtype=jnp.float32).reshape(1, h, w)
        padded, pad = ops.pad_for_mwcnn(x, n, axes=(-2, -1))
        block = 2 ** n
        assert padded.shape[-1] % block == 0 and padded.shape[-2] % block == 0
        back = ops.unpad_from_mwcnn(padded, pad, axes=(-2, -1))
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


class TestWaveletProperties:
    @settings(**SETTINGS)
    @given(h=st.integers(1, 12), w=st.integers(1, 12), c=st.integers(1, 4))
    def test_dwt_iwt_inverse_pair(self, h, w, c):
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 2 * h, 2 * w, c)),
            jnp.float32,
        )
        back = ops.iwt2(ops.dwt2(x))
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


class TestComplexProperties:
    @settings(**SETTINGS)
    @given(data=st.data())
    def test_field_axioms_match_numpy(self, data):
        a = _carr(data, 2, 3)
        b = _carr(data, 2, 3)
        ca, cb = from_complex(a), from_complex(b)
        np.testing.assert_allclose(to_numpy(ca * cb), a * b, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            to_numpy((ca * cb).conj()), (a * b).conj(), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray((ca * ca.conj()).re), np.abs(a) ** 2, rtol=1e-4, atol=1e-4
        )
