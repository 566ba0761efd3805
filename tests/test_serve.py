"""AOT export / serving-artifact tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cinemri_tpu.models import build_model
from cinemri_tpu.ops.cplx import from_complex
from cinemri_tpu.serve import export_model, load_exported

TINY = dict(num_cascades=1, sens_chans=4, sens_pools=2, chans=4, pools=2)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    k = (rng.standard_normal((1, 3, 2, 16, 16)) + 1j * rng.standard_normal((1, 3, 2, 16, 16))).astype(np.complex64)
    m = np.zeros((1, 3, 1, 16, 1), np.float32)
    m[:, :, :, 6:10] = 1
    m[:, :, :, 2] = 1
    model = build_model("varnet", "XF", **TINY)
    km = from_complex(k)
    mask = jnp.asarray(m)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), km, mask)
    return model, params, km, mask


class TestExport:
    def test_roundtrip_matches_live_model(self, setup, tmp_path):
        model, params, km, mask = setup
        # compare against the jitted forward (the exported artifact is the
        # jitted program; unjitted eager apply can differ in fusion order)
        want = np.asarray(jax.jit(model.apply)(params, km, mask))

        path = tmp_path / "varnet_xf.stablehlo"
        blob = export_model(model, params, km, mask, path=path)
        assert path.exists() and len(blob) > 1000

        fn = load_exported(path)
        got = np.asarray(fn(km.re, km.im, mask))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_artifact_is_self_contained(self, setup, tmp_path):
        """The loaded artifact runs from raw float arrays only — no model
        object, params, or Complex construction on the caller's side."""
        model, params, km, mask = setup
        blob = export_model(model, params, km, mask)
        fn = load_exported(blob)
        out = fn(np.asarray(km.re), np.asarray(km.im), np.asarray(mask))
        assert np.isfinite(np.asarray(out)).all()


class TestSerialBatch:
    def test_matches_per_volume_forward(self, setup):
        """serial_batch over n volumes == n independent batch-1 forwards."""
        from cinemri_tpu.serve import serial_batch

        model, params, km, mask = setup
        n = 3
        kb = jax.tree.map(lambda a: jnp.concatenate([a * (i + 1) for i in range(n)]), km)
        mb = jnp.concatenate([mask] * n)

        fwd = lambda k, m: model.apply(params, k, m)
        got = np.asarray(jax.jit(serial_batch(fwd))(kb, mb))
        assert got.shape[0] == n
        for i in range(n):
            unit = jax.tree.map(lambda a, i=i: a[i : i + 1], kb)
            want = np.asarray(jax.jit(fwd)(unit, mb[i : i + 1]))
            np.testing.assert_allclose(got[i : i + 1], want, rtol=1e-4, atol=1e-5)


class TestCineNetExport:
    def test_export_with_sens_maps(self, tmp_path):
        """CineNet-style export closes over (k, mask, sens) signatures."""
        rng = np.random.default_rng(3)
        k = (rng.standard_normal((1, 3, 2, 16, 16)) + 1j * rng.standard_normal((1, 3, 2, 16, 16))).astype(np.complex64)
        m = np.zeros((1, 3, 1, 16, 1), np.float32)
        m[:, :, :, 6:10] = 1
        m[:, :, :, 2] = 1
        sens = (rng.standard_normal((1, 1, 2, 16, 16)) + 1j * rng.standard_normal((1, 1, 2, 16, 16))).astype(np.complex64)
        sens /= np.sqrt((np.abs(sens) ** 2).sum(2, keepdims=True))

        model = build_model("cinenet", "XF", num_cascades=1, cg_iters=2, chans=4, pools=2)
        km, mask, sm = from_complex(k * m), jnp.asarray(m), from_complex(sens)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), km, mask, sm)
        want = np.asarray(jax.jit(model.apply)(params, km, mask, sm))

        blob = export_model(model, params, km, mask, sens_maps=sm)
        fn = load_exported(blob)
        got = np.asarray(fn(km.re, km.im, mask, sm.re, sm.im))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestSerialExport:
    def test_serial_batched_artifact(self, setup):
        """serial=True exports a batch-n artifact that matches n per-volume
        forwards (the lax.map program is baked into the StableHLO)."""
        from cinemri_tpu.serve import serial_batch

        model, params, km, mask = setup
        n = 2
        kb = jax.tree.map(lambda a: jnp.concatenate([a, a * 0.5]), km)
        mb = jnp.concatenate([mask] * n)
        blob = export_model(model, params, kb, mb, serial=True)
        fn = load_exported(blob)
        got = np.asarray(fn(kb.re, kb.im, mb))
        for i in range(n):
            unit = jax.tree.map(lambda a, i=i: a[i : i + 1], kb)
            want = np.asarray(
                jax.jit(lambda u, m: model.apply(params, u, m))(unit, mb[i : i + 1])
            )
            np.testing.assert_allclose(got[i : i + 1], want, rtol=1e-4, atol=1e-5)
