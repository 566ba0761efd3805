"""Tests for masks, transforms, dataset, and volume sharding."""

import numpy as np
import pytest

from cinemri_tpu.data import (
    CineNetDataTransform,
    EquispacedMask,
    RandomMask,
    SliceDataset,
    VarNetDataTransform,
    apply_mask_np,
    center_crop,
    center_crop_to_smallest,
    create_mask_for_mask_type,
    data_shard_indices,
    filtered_crop_center_and_slices,
    volume_shard_indices,
)
from cinemri_tpu.data.dataset import PreprocessConfig
from cinemri_tpu.data.synthetic import make_synthetic_dataset, synthetic_volume


class TestRandomMask:
    def test_shape_and_center_band(self):
        m = RandomMask([10], [4])(num_frames=5, num_rows=64, seed=7)
        assert m.shape == (5, 1, 64, 1)
        # 10 central lines always sampled (subsample.py:146-148)
        assert (m[:, 0, 32 - 5 : 32 + 5, 0] == 1).all()

    def test_expected_line_count(self):
        m = RandomMask([10], [4])(num_frames=8, num_rows=128, seed=0)
        lines = m[:, 0, :, 0].sum(axis=1)
        # n_lines = Nx/acc exactly per frame (center included)
        assert (lines == 128 // 4).all()

    def test_per_frame_masks_differ(self):
        m = RandomMask([10], [4])(num_frames=6, num_rows=96, seed=1)
        flat = m[:, 0, :, 0]
        assert len({tuple(row) for row in flat.astype(int)}) > 1

    def test_seed_reproducible(self):
        a = RandomMask([10], [4])(5, 64, seed=(3, 5))
        b = RandomMask([10], [4])(5, 64, seed=(3, 5))
        np.testing.assert_array_equal(a, b)

    def test_unseeded_draws_differ(self):
        gen = RandomMask([10], [4])
        assert not np.array_equal(gen(5, 64), gen(5, 64))

    def test_tail_adjusted_pdf_prefers_center(self):
        gen = RandomMask([0], [4])
        m = sum(gen(1, 128)[0, 0, :, 0] for _ in range(200)) / 200
        center_freq = m[40:88].mean()
        edge_freq = np.concatenate([m[:16], m[-16:]]).mean()
        assert center_freq > 2 * edge_freq
        assert edge_freq > 0  # uniform tail keeps edges reachable


class TestEquispacedMask:
    def test_static_over_time_and_rate(self):
        m = EquispacedMask([0.08], [4])(num_frames=9, num_rows=128, seed=2)
        assert m.shape == (1, 1, 128, 1)
        nlow = round(128 * 0.08)
        frac = m.sum() / 128
        assert abs(frac - 1 / 4) < 0.03  # exact-acceleration adjustment
        pad = (128 - nlow + 1) // 2
        assert (m[0, 0, pad : pad + nlow, 0] == 1).all()

    def test_factory(self):
        assert isinstance(create_mask_for_mask_type("random", [10], [4]), RandomMask)
        assert isinstance(
            create_mask_for_mask_type("equispaced", [0.08], [4]), EquispacedMask
        )
        with pytest.raises(ValueError):
            create_mask_for_mask_type("poisson", [10], [4])


class TestTransforms:
    def test_center_crop(self):
        x = np.arange(100.0).reshape(10, 10)
        c = center_crop(x, (4, 6))
        assert c.shape == (4, 6)
        np.testing.assert_array_equal(c, x[3:7, 2:8])

    def test_center_crop_to_smallest_mixed(self):
        a = np.zeros((3, 8, 12))
        b = np.zeros((3, 10, 6))
        ca, cb = center_crop_to_smallest(a, b)
        assert ca.shape == cb.shape == (3, 8, 6)

    def test_filtered_crop(self, rng):
        data = (rng.standard_normal((6, 4, 32, 32)) + 1j * rng.standard_normal((6, 4, 32, 32))).astype(np.complex64)
        crop, filt = filtered_crop_center_and_slices(
            data, (24, 24), 4, [0.7, 0.0, 0.3, 0.3]
        )
        assert crop.shape == filt.shape == (4, 4, 24, 24)
        # smoothing reduces high-frequency energy
        assert np.abs(np.diff(filt.real, axis=-1)).mean() < np.abs(
            np.diff(crop.real, axis=-1)
        ).mean()

    def test_apply_mask_zeroes_unsampled(self, rng):
        k = (rng.standard_normal((3, 2, 16, 8)) + 1j * rng.standard_normal((3, 2, 16, 8))).astype(np.complex64)
        masked, mask = apply_mask_np(k, RandomMask([4], [4]), seed=5)
        assert mask.shape == (3, 1, 16, 1)
        np.testing.assert_array_equal(masked, k * mask)

    def test_varnet_transform_sample(self, rng):
        vol = synthetic_volume(num_frames=4, num_coils=3, h=32, w=32)
        tr = VarNetDataTransform(mask_func=RandomMask([4], [4]), use_seed=True)
        target = vol["image"][:, 2:-2, 2:-2]
        s = tr(vol["kspace"], None, target, {}, "vol_a.h5", 0)
        assert s["masked_kspace"].shape == (4, 3, 32, 32)
        assert s["mask"].shape == (4, 1, 32, 1)
        assert s["max_value"] == pytest.approx(target.max())
        # filename-seeded: same file → same mask (transforms.py:324)
        s2 = tr(vol["kspace"], None, target, {}, "vol_a.h5", 0)
        np.testing.assert_array_equal(s["mask"], s2["mask"])

    def test_cinenet_transform_adds_maps(self):
        vol = synthetic_volume(num_frames=4, num_coils=4, h=48, w=48)
        tr = CineNetDataTransform(mask_func=RandomMask([8], [2]), use_seed=True)
        s = tr(vol["kspace"], None, vol["image"], {}, "vol_b.h5", 0)
        assert s["sens_maps"].shape == (1, 4, 48, 48)
        assert s["sens_maps"].dtype == np.complex64
        assert np.abs(s["sens_maps"]).max() > 0.1


class TestDataset:
    @pytest.fixture(scope="class")
    def data_root(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("data")
        return make_synthetic_dataset(
            root, splits=("train",), volumes_per_split=3, num_frames=5,
            num_coils=4, h=48, w=48,
        )

    def test_listing_and_metadata(self, data_root):
        ds = SliceDataset(data_root / "train")
        assert len(ds) == 3
        assert ds.examples[0].metadata["num_coils"] == 4
        assert ds.examples[0].metadata["encoding_size"] == (48, 48)

    def test_getitem_preprocess_chain(self, data_root, tmp_path):
        ds = SliceDataset(
            data_root / "train",
            transform=VarNetDataTransform(RandomMask([8], [2]), use_seed=True),
            maps_cache_dir=tmp_path / "maps",
        )
        s = ds[0]
        t, c, h, w = s["masked_kspace"].shape
        assert (t, c) == (5, 4)
        cfg = PreprocessConfig().scaled_to(48, 48, 5)
        assert (h, w) == cfg.crop_shape
        assert s["target"].shape == (5,) + cfg.crop_target
        assert s["max_value"] > 0
        # second access hits the cache and is identical
        s2 = ds[0]
        np.testing.assert_array_equal(s["target"], s2["target"])
        assert (tmp_path / "maps").exists()

    def test_target_matches_phantom_structure(self, data_root, tmp_path):
        """The ESPIRiT-combined target must reproduce phantom intensity."""
        ds = SliceDataset(data_root / "train", maps_cache_dir=tmp_path / "m2")
        kspace, _, target, _, fname, _ = ds[0]
        assert target.max() > 0.5e0  # ×1e6 of the 1e-6-scaled store ≈ O(1)
        # bright ring should appear in every frame
        assert (target.reshape(5, -1).max(axis=1) > 0.5 * target.max()).all()

    def test_volume_sample_rate(self, data_root):
        ds = SliceDataset(data_root / "train", volume_sample_rate=0.67)
        assert len(ds) == 2

    def test_num_cols_filter(self, data_root):
        assert len(SliceDataset(data_root / "train", num_cols=[48])) == 3
        assert len(SliceDataset(data_root / "train", num_cols=[999])) == 0


class TestSharding:
    def _examples(self, vols=5, slices=3):
        return [(f"vol{v:02d}", s) for v in range(vols) for s in range(slices)]

    def test_volumes_stay_whole(self):
        ex = self._examples()
        for rank in range(2):
            idx = volume_shard_indices(ex, 2, rank, shuffle=False)
            vols = {ex[i][0] for i in idx}
            for v in vols:  # every slice of an owned volume is present
                assert sum(ex[i][0] == v for i in idx) >= 3

    def test_ranks_partition_and_pad_equal(self):
        ex = self._examples(vols=5)
        a = volume_shard_indices(ex, 2, 0, shuffle=False)
        b = volume_shard_indices(ex, 2, 1, shuffle=False)
        assert len(a) == len(b) == 9  # 3 vols * 3 slices on the big rank
        assert {ex[i][0] for i in a}.isdisjoint({ex[i][0] for i in b})

    def test_epoch_seeded_shuffle(self):
        ex = self._examples(vols=8)
        a = volume_shard_indices(ex, 2, 0, shuffle=True, seed=1, epoch=0)
        b = volume_shard_indices(ex, 2, 0, shuffle=True, seed=1, epoch=0)
        c = volume_shard_indices(ex, 2, 0, shuffle=True, seed=1, epoch=1)
        assert a == b
        assert set(a) == set(c)
        assert a != c

    def test_data_shard_indices_cover_all(self):
        got = sorted(
            i for r in range(4) for i in data_shard_indices(10, 4, r, shuffle=False)
        )
        assert set(got) == set(range(10))
        lens = {len(data_shard_indices(10, 4, r, shuffle=False)) for r in range(4)}
        assert lens == {3}  # padded to equal length


class TestShapeBucketing:
    def test_mixed_coil_counts_yield_homogeneous_batches(self, tmp_path, rng):
        """Volumes with different coil counts must never share a batch
        (SURVEY §7 hard part #6)."""
        from cinemri_tpu.data.synthetic import write_hdf5_volume
        from cinemri_tpu.train.loader import Loader

        d = tmp_path / "mixed"
        d.mkdir()
        for i, nc in enumerate([3, 5, 3, 5]):
            write_hdf5_volume(d / f"v{i}.h5", num_frames=3, num_coils=nc, h=24, w=24, seed=i)
        ds = SliceDataset(d, transform=VarNetDataTransform(RandomMask([4], [2])),
                          maps_cache_dir=tmp_path / "m")
        loader = Loader(ds, batch_size=2, shuffle=True, seed=3)
        seen = []
        for batch in loader.epoch(0):
            # np.stack would raise on heterogeneous shapes; also check coils
            seen.append(batch["masked_kspace"].shape[2])
        assert sorted(seen) == [3, 5]

    def test_mixed_shapes_with_batch_straddling_buckets(self, tmp_path, rng):
        """Odd bucket sizes must not produce mixed-shape batches: each
        bucket pads its own trailing batch."""
        from cinemri_tpu.data.synthetic import write_hdf5_volume
        from cinemri_tpu.train.loader import Loader

        d = tmp_path / "straddle"
        d.mkdir()
        for i, nc in enumerate([3, 3, 3, 5]):  # bucket sizes 3 and 1
            write_hdf5_volume(d / f"v{i}.h5", num_frames=3, num_coils=nc, h=24, w=24, seed=i)
        ds = SliceDataset(d, transform=VarNetDataTransform(RandomMask([4], [2])),
                          maps_cache_dir=tmp_path / "ms")
        loader = Loader(ds, batch_size=2, shuffle=True, seed=0)
        shapes = [b["masked_kspace"].shape for b in loader.epoch(0)]
        assert len(shapes) == loader.steps_per_epoch() == 3
        coil_counts = sorted(s[2] for s in shapes)
        assert coil_counts == [3, 3, 5]  # 2 batches of 3-coil, 1 padded 5-coil


class TestCineNetMapCaching:
    def test_cached_maps_reused_across_epochs(self, rng, monkeypatch):
        from cinemri_tpu.data import CineNetDataTransform, RandomMask
        import cinemri_tpu.data.espirit as esp

        vol = synthetic_volume(num_frames=3, num_coils=3, h=32, w=32)
        calls = {"n": 0}
        real = esp.espirit_maps

        def counting(*a, **k):
            calls["n"] += 1
            return real(*a, **k)

        monkeypatch.setattr(esp, "espirit_maps", counting)
        tr = CineNetDataTransform(RandomMask([6], [2]), use_seed=False, cache_maps=True)
        for _ in range(3):  # three "epochs"
            s = tr(vol["kspace"], None, vol["image"], {}, "v.h5", 0)
        assert calls["n"] == 1
        assert s["sens_maps"].shape == (1, 3, 32, 32)

        tr2 = CineNetDataTransform(RandomMask([6], [2]), use_seed=False)  # default off
        for _ in range(2):
            tr2(vol["kspace"], None, vol["image"], {}, "v.h5", 0)
        assert calls["n"] == 3  # recomputed per call, reference semantics

    def test_disk_cache_survives_process_restart(self, monkeypatch, tmp_path):
        """maps_cache_dir persists cached maps as .npz so a fresh transform
        (new process) reuses them instead of recomputing (VERDICT r2 #4)."""
        from cinemri_tpu.data import CineNetDataTransform, RandomMask
        import cinemri_tpu.data.espirit as esp

        vol = synthetic_volume(num_frames=3, num_coils=3, h=32, w=32)
        calls = {"n": 0}
        real = esp.espirit_maps

        def counting(*a, **k):
            calls["n"] += 1
            return real(*a, **k)

        monkeypatch.setattr(esp, "espirit_maps", counting)
        mk = lambda: CineNetDataTransform(
            RandomMask([6], [2]), use_seed=False, cache_maps=True,
            maps_cache_dir=tmp_path / "mc",
        )
        tr = mk()
        s1 = tr(vol["kspace"], None, vol["image"], {}, "v.h5", 0)
        assert calls["n"] == 1
        assert list((tmp_path / "mc").glob("*.maps.npz"))

        tr2 = mk()  # fresh instance = simulated restart
        s2 = tr2(vol["kspace"], None, vol["image"], {}, "v.h5", 0)
        assert calls["n"] == 1  # served from disk
        np.testing.assert_array_equal(s1["sens_maps"], s2["sens_maps"])

        # a different mask config must NOT reuse the cached maps
        tr3 = CineNetDataTransform(
            RandomMask([6], [4]), use_seed=False, cache_maps=True,
            maps_cache_dir=tmp_path / "mc",
        )
        tr3(vol["kspace"], None, vol["image"], {}, "v.h5", 0)
        assert calls["n"] == 2


class TestCoilCompression:
    """SVD coil compression (data/compress.py) — beyond-reference speed mode."""

    def _mask(self, t, h, center=6):
        m = np.zeros((t, 1, h, 1), np.float32)
        m[:, :, h // 2 - center // 2 : h // 2 + center // 2] = 1
        # add per-frame random extra lines outside the band
        rng = np.random.default_rng(3)
        for ti in range(t):
            m[ti, :, rng.choice(h, 4, replace=False)] = 1
        return m

    def test_matrix_is_orthonormal_and_deterministic(self):
        from cinemri_tpu.data.compress import compression_matrix

        vol = synthetic_volume(num_frames=4, num_coils=6, h=32, w=32)
        m = self._mask(4, 32)
        c1 = compression_matrix(vol["kspace"] * m, 4, m)
        c2 = compression_matrix(vol["kspace"] * m, 4, m)
        np.testing.assert_allclose(
            c1.conj().T @ c1, np.eye(4, dtype=np.complex64), atol=1e-6
        )
        np.testing.assert_array_equal(c1, c2)

    def test_energy_capture_and_unitary_completeness(self):
        """v = c is a unitary rotation (lossless); at v < c the residual is
        bounded by the discarded singular energy and shrinks as v grows."""
        from cinemri_tpu.data.compress import apply_compression, compression_matrix

        vol = synthetic_volume(num_frames=4, num_coils=8, h=32, w=32)
        k = vol["kspace"]

        def resid(v):
            cmat = compression_matrix(k, v)
            kv = apply_compression(k, cmat)
            k_back = np.einsum("cv,tvhw->tchw", cmat, kv)
            return np.linalg.norm(k - k_back) / np.linalg.norm(k)

        r8, r6, r4 = resid(8), resid(6), resid(4)
        assert r8 < 1e-5, r8  # square C: complete unitary basis
        assert r6 < 0.05 and r4 < 0.12, (r6, r4)
        assert r8 < r6 < r4
        # the RSS image from 6 virtual coils matches the physical-coil RSS
        cmat = compression_matrix(k, 6)
        kv = apply_compression(k, cmat)
        img = np.fft.ifft2(np.fft.ifftshift(np.fft.ifftshift(k, axes=-2), axes=-1), norm="ortho")
        img_v = np.fft.ifft2(np.fft.ifftshift(np.fft.ifftshift(kv, axes=-2), axes=-1), norm="ortho")
        rss = np.sqrt((np.abs(img) ** 2).sum(1))
        rss_v = np.sqrt((np.abs(img_v) ** 2).sum(1))
        np.testing.assert_allclose(rss_v, rss, rtol=0.05, atol=0.03 * rss.max())

    def test_transform_emits_virtual_coils(self):
        vol = synthetic_volume(num_frames=4, num_coils=6, h=32, w=32)
        tr = VarNetDataTransform(
            mask_func=RandomMask([6], [2]), use_seed=True, compress_coils=3
        )
        s = tr(vol["kspace"], None, vol["image"], {}, "vol_cc.h5", 0)
        assert s["masked_kspace"].shape == (4, 3, 32, 32)
        # unsampled lines stay zero after the coil mixing
        np.testing.assert_array_equal(
            s["masked_kspace"] * (1 - s["mask"]), np.zeros_like(s["masked_kspace"])
        )

    def test_cinenet_maps_follow_virtual_coils(self):
        vol = synthetic_volume(num_frames=4, num_coils=6, h=48, w=48)
        tr = CineNetDataTransform(
            mask_func=RandomMask([8], [2]), use_seed=True, compress_coils=4
        )
        s = tr(vol["kspace"], None, vol["image"], {}, "vol_cc2.h5", 0)
        assert s["masked_kspace"].shape == (4, 4, 48, 48)
        assert s["sens_maps"].shape == (1, 4, 48, 48)

    def test_compress_coils_zero_is_identity_path(self):
        vol = synthetic_volume(num_frames=3, num_coils=4, h=32, w=32)
        t0 = VarNetDataTransform(mask_func=RandomMask([6], [2]), use_seed=True)
        t1 = VarNetDataTransform(
            mask_func=RandomMask([6], [2]), use_seed=True, compress_coils=0
        )
        s0 = t0(vol["kspace"], None, vol["image"], {}, "vol_cc3.h5", 0)
        s1 = t1(vol["kspace"], None, vol["image"], {}, "vol_cc3.h5", 0)
        np.testing.assert_array_equal(s0["masked_kspace"], s1["masked_kspace"])

    def test_suggest_num_virtual(self):
        from cinemri_tpu.data.compress import suggest_num_virtual

        vol = synthetic_volume(num_frames=4, num_coils=8, h=32, w=32)
        v999 = suggest_num_virtual(vol["kspace"], energy_threshold=0.999)
        v9999 = suggest_num_virtual(vol["kspace"], energy_threshold=0.9999)
        vall = suggest_num_virtual(vol["kspace"], energy_threshold=1.0)
        assert 1 <= v999 <= v9999 <= vall <= 8
        # phantom spectrum measured: 0.999 needs ~5-6 of 8 coils
        assert v999 < 8

    def test_redundant_array_compresses_losslessly(self):
        """The technique's domain: a 12-coil array spanning 5 smooth modes
        compresses to v=6 with negligible residual and identical RSS."""
        from cinemri_tpu.data.compress import (
            apply_compression,
            compression_matrix,
            suggest_num_virtual,
        )
        from cinemri_tpu.data.synthetic import cine_phantom, redundant_coil_sensitivities

        rng = np.random.default_rng(5)
        sens = redundant_coil_sensitivities(12, 32, 32, num_modes=5, rng=rng)
        img = cine_phantom(4, 32, 32)
        coil = img[:, None] * sens[None]
        k = np.fft.fftshift(
            np.fft.fft2(np.fft.ifftshift(coil, axes=(-2, -1)), norm="ortho"),
            axes=(-2, -1),
        ).astype(np.complex64)
        assert suggest_num_virtual(k, energy_threshold=0.9999) <= 6
        cmat = compression_matrix(k, 6)
        kv = apply_compression(k, cmat)
        k_back = np.einsum("cv,tvhw->tchw", cmat, kv)
        resid = np.linalg.norm(k - k_back) / np.linalg.norm(k)
        assert resid < 1e-3, resid
        img_f = np.fft.ifft2(np.fft.ifftshift(np.fft.ifftshift(k, axes=-2), axes=-1), norm="ortho")
        img_v = np.fft.ifft2(np.fft.ifftshift(np.fft.ifftshift(kv, axes=-2), axes=-1), norm="ortho")
        rss = np.sqrt((np.abs(img_f) ** 2).sum(1))
        rss_v = np.sqrt((np.abs(img_v) ** 2).sum(1))
        np.testing.assert_allclose(rss_v, rss, rtol=2e-3, atol=2e-3 * rss.max())
