"""Instrumentation tests: timers, NaN sanitizers, trace capture."""

import jax.numpy as jnp
import numpy as np
import pytest

from cinemri_tpu.instrument import StepTimer, assert_finite, enable_nan_checks, trace


class TestStepTimer:
    def test_records_and_summarizes(self):
        t = StepTimer()
        for _ in range(5):
            with t.step():
                jnp.ones((64, 64)).sum().block_until_ready()
        s = t.summary()
        assert s["count"] == 5
        assert 0 < s["p50_s"] <= s["max_s"]

    def test_empty_summary(self):
        assert StepTimer().summary() == {}


class TestSanitizers:
    def test_assert_finite_passes(self):
        assert_finite({"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}})

    def test_assert_finite_names_the_leaf(self):
        with pytest.raises(FloatingPointError, match="params.*w"):
            assert_finite({"w": jnp.asarray([1.0, np.nan])}, name="params")

    def test_nan_checks_toggle(self):
        import jax

        enable_nan_checks(True)
        try:
            with pytest.raises(FloatingPointError):
                jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()
        finally:
            enable_nan_checks(False)


class TestTrace:
    def test_trace_writes_profile(self, tmp_path):
        with trace(tmp_path / "prof"):
            jnp.ones((128, 128)).sum().block_until_ready()
        assert any((tmp_path / "prof").rglob("*"))


class TestOpStats:
    def test_parses_existing_trace(self, tmp_path):
        """Capture a tiny trace and aggregate op durations from it."""
        pytest.importorskip("tensorflow")
        import jax
        import jax.numpy as jnp

        from cinemri_tpu import instrument
        from cinemri_tpu.instrument import opstats

        f = jax.jit(lambda x: jnp.sum(x * x + 1.0))
        x = jnp.ones((256, 256))
        float(f(x))
        with instrument.trace(tmp_path):
            float(f(x))

        by_kind = opstats.durations_by_kind(tmp_path)
        assert isinstance(by_kind, dict)
        top = opstats.top_ops(tmp_path, n=5)
        assert all(isinstance(ms, float) for _, ms in top)


class TestProfileForwardHarness:
    def test_smoke_tiny_shape_json_contract(self, capsys):
        """bench/profile_forward runs end-to-end on CPU at a tiny shape and
        prints one JSON line with the documented fields."""
        pytest.importorskip("tensorflow")
        import json
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "bench"))
        import profile_forward

        profile_forward.main("varnet-2D", runs=2, shape=(2, 2, 16, 16))
        out = capsys.readouterr().out.strip().splitlines()[-1]
        rec = json.loads(out)
        assert rec["model"] == "varnet-2D"
        assert rec["mode"] == "forward"
        assert rec["wall_ms"] > 0 and rec["fps"] > 0
        # attribution is a lower bound and may be empty off-chip, but the
        # fields must exist and be consistent
        assert "attributed_ms" in rec and "by_kind_ms" in rec
        if rec["attribution_coverage"] is not None:
            assert rec["attributed_ms"] <= rec["wall_ms"] * 1.5
