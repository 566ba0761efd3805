"""ESPIRiT validation on synthetic phantoms with known coil sensitivities."""

import jax.numpy as jnp
import numpy as np
import pytest

from cinemri_tpu.data.espirit import espirit_maps
from cinemri_tpu.data.synthetic import synthetic_volume


@pytest.fixture(scope="module")
def phantom():
    return synthetic_volume(num_frames=6, num_coils=6, h=48, w=48, seed=3)


def _support(vol, thresh=0.15):
    """Pixels where the object is bright enough for maps to be identifiable."""
    return vol["image"].mean(0) > thresh * vol["image"].mean(0).max()


class TestEspirit:
    def test_shapes_and_dtype(self, phantom):
        tavg = phantom["kspace"].mean(0)
        maps, ev = espirit_maps(tavg, calib_size=24, return_eigenvalues=True)
        assert maps.shape == phantom["sens"].shape
        assert maps.dtype == jnp.complex64
        assert ev.shape == phantom["sens"].shape[1:]

    def test_top_eigenvalue_near_one_in_support(self, phantom):
        tavg = phantom["kspace"].mean(0)
        _, ev = espirit_maps(tavg, calib_size=24, return_eigenvalues=True)
        sup = _support(phantom)
        ev = np.asarray(ev)
        assert np.median(ev[sup]) > 0.92
        # well below 1 outside the object (corners)
        corner = np.zeros_like(sup)
        corner[:4, :4] = True
        assert ev[corner].mean() < 0.9

    def test_magnitude_matches_true_sensitivities(self, phantom):
        """|maps| == |sens| in the support (true maps are RSS-normalized)."""
        tavg = phantom["kspace"].mean(0)
        maps = np.asarray(espirit_maps(tavg, calib_size=24))
        sup = _support(phantom)
        err = np.abs(np.abs(maps) - np.abs(phantom["sens"]))[:, sup]
        assert np.median(err) < 0.03
        assert err.mean() < 0.08

    def test_coil_vector_alignment(self, phantom):
        """At each support pixel the coil-image vector is parallel to the map:
        |⟨img(x), s(x)⟩| ≈ ‖img(x)‖ (the phase convention cancels)."""
        tavg_img = np.fft.fftshift(
            np.fft.ifft2(
                np.fft.ifftshift(phantom["kspace"].mean(0), axes=(-2, -1)),
                norm="ortho",
            ),
            axes=(-2, -1),
        )  # (c, h, w)
        maps = np.asarray(espirit_maps(phantom["kspace"].mean(0), calib_size=24))
        sup = _support(phantom)
        proj = np.abs((tavg_img * maps.conj()).sum(0))[sup]
        norm = np.sqrt((np.abs(tavg_img) ** 2).sum(0))[sup]
        ratio = proj / np.maximum(norm, 1e-8)
        assert np.median(ratio) > 0.99

    def test_combined_target_matches_phantom(self, phantom):
        """|Σ img·conj(s)| reproduces the object intensity (the reference's
        target synthesis recipe, mri_data.py:302-303)."""
        img = np.fft.fftshift(
            np.fft.ifft2(
                np.fft.ifftshift(phantom["kspace"], axes=(-2, -1)), norm="ortho"
            ),
            axes=(-2, -1),
        )  # (t, c, h, w)
        maps = np.asarray(espirit_maps(phantom["kspace"].mean(0), calib_size=24))
        target = np.abs((img * maps.conj()[None]).sum(1))  # (t, h, w)
        sup = _support(phantom)
        rel = np.abs(target - phantom["image"])[:, sup] / phantom["image"][:, sup].max()
        assert np.median(rel) < 0.03

    def test_small_calib_region(self, phantom):
        """CineNet-style r=15 calibration still yields usable maps."""
        tavg = phantom["kspace"].mean(0)
        maps = np.asarray(espirit_maps(tavg, calib_size=15))
        sup = _support(phantom)
        err = np.abs(np.abs(maps) - np.abs(phantom["sens"]))[:, sup]
        assert np.median(err) < 0.08


class TestEspiritMulti:
    """Multi-set ESPIRiT (soft-SENSE) — espirit_maps_multi."""

    def test_set0_equals_single_map(self, phantom):
        from cinemri_tpu.data.espirit import espirit_maps_multi

        tavg = phantom["kspace"].mean(0)
        single = espirit_maps(tavg, calib_size=24)
        multi, ev = espirit_maps_multi(
            tavg, num_maps=2, calib_size=24, return_eigenvalues=True
        )
        assert multi.shape == (2,) + single.shape
        assert ev.shape == (2,) + single.shape[1:]
        np.testing.assert_allclose(multi[0], single, atol=1e-6)

    def test_sets_orthogonal_per_pixel(self, phantom):
        from cinemri_tpu.data.espirit import espirit_maps_multi

        tavg = phantom["kspace"].mean(0)
        multi = espirit_maps_multi(tavg, num_maps=2, calib_size=24, crop=0.0)
        # eigenvectors of a Hermitian pointwise operator: <S0(x), S1(x)> = 0
        inner = np.abs((multi[0].conj() * multi[1]).sum(0))
        assert inner.max() < 1e-5

    def test_second_eigenvalue_discriminates_aliasing(self, phantom):
        """On a full-FOV phantom the 2nd eigenvalue stays far below 1; on a
        2x-folded acquisition (FOV aliasing) it rises toward 1 inside the
        overlap — the soft-SENSE signature the extra map sets exist for."""
        from cinemri_tpu.data.espirit import espirit_maps_multi

        tavg = np.asarray(phantom["kspace"].mean(0))  # (c, h, w)
        _, ev_clean = espirit_maps_multi(
            tavg, num_maps=2, calib_size=24, return_eigenvalues=True
        )
        sup = _support(phantom)
        assert np.median(np.asarray(ev_clean)[1][sup]) < 0.7

        # fold the FOV: keep every 2nd k-space row -> half-FOV acquisition
        # whose image is the sum of the two vertical halves
        img = np.fft.ifft2(np.fft.ifftshift(tavg, axes=(-2, -1)))
        c, h, w = img.shape
        folded = img[:, : h // 2] + img[:, h // 2 :]
        kf = np.fft.fftshift(np.fft.fft2(folded), axes=(-2, -1))
        _, ev_fold = espirit_maps_multi(
            kf.astype(np.complex64), num_maps=2, calib_size=24,
            return_eigenvalues=True,
        )
        overlap = np.asarray(_support(phantom))[: h // 2] & np.asarray(
            _support(phantom)
        )[h // 2 :]
        if overlap.sum() > 20:  # phantom halves actually overlap
            assert np.median(np.asarray(ev_fold)[1][overlap]) > np.median(
                np.asarray(ev_clean)[1][sup]
            )


class TestSoftSenseOps:
    def test_adjointness(self):
        import jax

        from cinemri_tpu.ops.cplx import Complex
        from cinemri_tpu.physics import soft_sense_expand, soft_sense_reduce

        rng = np.random.default_rng(7)
        b, t, m, c, h, w = 1, 3, 2, 4, 16, 16

        def rnd(*shape):
            return Complex(
                jnp.asarray(rng.standard_normal(shape), jnp.float32),
                jnp.asarray(rng.standard_normal(shape), jnp.float32),
            )

        x = rnd(b, t, m, h, w)
        y = rnd(b, t, c, h, w)
        s = rnd(b, m, c, h, w)
        ax = soft_sense_expand(x, s)
        aty = soft_sense_reduce(y, s)
        lhs = np.vdot(
            np.asarray(ax.re) + 1j * np.asarray(ax.im),
            np.asarray(y.re) + 1j * np.asarray(y.im),
        )
        rhs = np.vdot(
            np.asarray(x.re) + 1j * np.asarray(x.im),
            np.asarray(aty.re) + 1j * np.asarray(aty.im),
        )
        np.testing.assert_allclose(lhs, rhs, rtol=1e-4)

    def test_m1_reduces_to_hard_sense(self):
        from cinemri_tpu.ops.cplx import Complex
        from cinemri_tpu.physics import (
            sens_expand,
            sens_reduce,
            soft_sense_expand,
            soft_sense_reduce,
        )

        rng = np.random.default_rng(8)
        b, t, c, h, w = 1, 2, 3, 16, 16

        def rnd(*shape):
            return Complex(
                jnp.asarray(rng.standard_normal(shape), jnp.float32),
                jnp.asarray(rng.standard_normal(shape), jnp.float32),
            )

        x = rnd(b, t, 1, h, w)
        s = rnd(b, 1, c, h, w)
        k = rnd(b, t, c, h, w)
        a = soft_sense_expand(x, s)
        bfwd = sens_expand(x, s)
        np.testing.assert_allclose(np.asarray(a.re), np.asarray(bfwd.re), atol=1e-5)
        np.testing.assert_allclose(np.asarray(a.im), np.asarray(bfwd.im), atol=1e-5)
        r1 = soft_sense_reduce(k, s)
        r2 = sens_reduce(k, s)
        np.testing.assert_allclose(np.asarray(r1.re), np.asarray(r2.re), atol=1e-5)
        np.testing.assert_allclose(np.asarray(r1.im), np.asarray(r2.im), atol=1e-5)

    def test_recon_dealiases(self, phantom):
        """On a folded-FOV (2x-aliased) acquisition, 2-set soft-SENSE CG
        drives the data residual far below what a single map set can reach
        — the single map cannot represent the folded signal at all."""
        from cinemri_tpu.data.espirit import espirit_maps_multi
        from cinemri_tpu.ops.cplx import from_complex
        from cinemri_tpu.ops.fft import fft2c
        from cinemri_tpu.physics import (
            apply_mask,
            soft_sense_expand,
            soft_sense_recon,
        )

        tavg = np.asarray(phantom["kspace"].mean(0))  # (c, h, w) centered
        img = np.fft.ifft2(np.fft.ifftshift(tavg, axes=(-2, -1)))
        c, h, w = img.shape
        folded = (img[:, : h // 2] + img[:, h // 2 :]).astype(np.complex64)

        y = fft2c(from_complex(folded[None, None]))  # (1, 1, c, h/2, w)
        y_np = np.asarray(y.re) + 1j * np.asarray(y.im)
        maps2 = espirit_maps_multi(
            y_np[0, 0], num_maps=2, calib_size=24, crop=0.6
        )
        mask = jnp.ones((1, 1, 1, h // 2, 1), jnp.float32)

        def rel_resid(maps_m):
            s = from_complex(np.asarray(maps_m)[None])  # (1, m, c, h/2, w)
            x = soft_sense_recon(
                y, mask, s, lam=1e-4, iters=15, return_components=True
            )
            r = apply_mask(soft_sense_expand(x, s), mask) - y
            num = np.sqrt(float((r.abs() ** 2).sum()))
            den = np.sqrt(float((y.abs() ** 2).sum()))
            return num / den

        resid2 = rel_resid(maps2)
        resid1 = rel_resid(maps2[:1])
        assert resid2 < 0.08, resid2
        assert resid1 > 2 * resid2, (resid1, resid2)
