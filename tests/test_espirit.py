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
