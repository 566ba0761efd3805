"""Cross-validation of the C++ ESPIRiT against the numpy implementation.

SURVEY §2a prescribes shipping the native calibration library and the
Python/array implementation "both validated against each other" — the
sensitivity maps define the training targets, so the two must agree.
"""

import numpy as np
import pytest

from cinemri_tpu.data.espirit import espirit_maps
from cinemri_tpu.data.synthetic import synthetic_volume

native = pytest.importorskip("cinemri_tpu.native")


@pytest.fixture(scope="module")
def phantom():
    return synthetic_volume(num_frames=4, num_coils=5, h=40, w=40, seed=7)


@pytest.fixture(scope="module")
def maps_pair(phantom):
    tavg = phantom["kspace"].mean(0)
    py_maps, py_eig = espirit_maps(tavg, calib_size=24, return_eigenvalues=True)
    cc_maps, cc_eig = native.espirit_maps_native(
        tavg, calib_size=24, return_eigenvalues=True
    )
    return py_maps, py_eig, cc_maps, cc_eig


class TestNativeEspirit:
    def test_library_builds(self):
        assert native.build_library().exists()

    def test_eigenvalues_match(self, maps_pair):
        _, py_eig, _, cc_eig = maps_pair
        np.testing.assert_allclose(cc_eig, py_eig, atol=5e-3)

    def test_map_magnitudes_match(self, maps_pair):
        # Pixels whose two top eigenvalues are both ~1 (ESPIRiT's two-map
        # aliasing regions) have an ambiguous leading eigenvector; the two
        # implementations may legitimately differ there, so compare by
        # quantile rather than max.
        py_maps, py_eig, cc_maps, _ = maps_pair
        sup = py_eig > 0.9
        err = np.abs(np.abs(cc_maps) - np.abs(py_maps))[:, sup]
        assert np.median(err) < 1e-4
        assert np.quantile(err, 0.99) < 2e-2

    def test_maps_match_up_to_pixel_phase(self, maps_pair):
        """Inner product |⟨s_py(x), s_cc(x)⟩| == 1 where both are defined
        (eigenvectors agree up to a per-pixel global phase)."""
        py_maps, py_eig, cc_maps, cc_eig = maps_pair
        sup = (py_eig > 0.9) & (cc_eig > 0.9)
        inner = np.abs((py_maps.conj() * cc_maps).sum(axis=0))[sup]
        assert np.median(inner) > 0.999
        assert np.quantile(inner, 0.01) > 0.95  # degenerate pixels excluded

    def test_magnitude_matches_true_sensitivities(self, phantom):
        tavg = phantom["kspace"].mean(0)
        maps = native.espirit_maps_native(tavg, calib_size=24)
        sup = phantom["image"].mean(0) > 0.15 * phantom["image"].mean(0).max()
        err = np.abs(np.abs(maps) - np.abs(phantom["sens"]))[:, sup]
        assert np.median(err) < 0.05


class TestEngineSelection:
    """PreprocessConfig.espirit_engine routes the cold calibration pass."""

    def test_native_engine_in_preprocess(self, phantom):
        from cinemri_tpu.data.dataset import PreprocessConfig, preprocess_volume

        raw = np.transpose(np.asarray(phantom["kspace"]), (0, 2, 3, 1)) / 1e6
        t, h, w, c = raw.shape
        base = PreprocessConfig().scaled_to(h, w, t)
        out_np = preprocess_volume(raw, base)
        out_nat = preprocess_volume(
            raw, __import__("dataclasses").replace(base, espirit_engine="native")
        )
        assert out_nat["sens"].shape == out_np["sens"].shape
        # targets are |sum img conj(sens)| — insensitive to per-pixel map
        # phase freedom, so the two engines must agree closely there
        a, b = out_np["target"], out_nat["target"]
        s = a.max() + 1e-12
        np.testing.assert_allclose(a / s, b / s, atol=5e-3)

    def test_env_var_overrides(self, phantom, monkeypatch):
        import cinemri_tpu.data.dataset as ds

        raw = np.transpose(np.asarray(phantom["kspace"]), (0, 2, 3, 1)) / 1e6
        t, h, w, c = raw.shape
        base = ds.PreprocessConfig().scaled_to(h, w, t)
        calls = []
        import cinemri_tpu.native as nat

        real = nat.espirit_maps_native
        monkeypatch.setattr(
            nat, "espirit_maps_native",
            lambda *a, **k: (calls.append(1), real(*a, **k))[1],
        )
        monkeypatch.setenv("CINEMRI_ESPIRIT_ENGINE", "native")
        ds.preprocess_volume(raw, base)
        assert calls, "native engine was not invoked despite the env override"
