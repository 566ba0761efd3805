"""Driver-contract checks: the multi-chip dry run executes on the CPU mesh."""

import importlib.util
import os
import subprocess
import sys
from pathlib import Path

import pytest


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestGraftEntry:
    def test_dryrun_multichip_eight_devices(self):
        _load_entry().dryrun_multichip(8)

    def test_dryrun_multichip_two_devices(self):
        _load_entry().dryrun_multichip(2)

    def test_dryrun_self_provisions_on_one_device_host(self):
        """The driver's deployment condition (VERDICT r1 #1): the bench host
        exposes ONE device, and ``dryrun_multichip(8)`` must self-provision a
        virtual 8-device mesh via subprocess re-exec rather than crash with
        "mesh needs 8 devices, have 1". Run it in a subprocess whose
        environment forces a single CPU device — i.e. WITHOUT conftest's
        8-device XLA_FLAGS — and assert success."""
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = " ".join(
            f
            for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f
        )
        root = Path(__file__).parent.parent
        code = (
            f"import sys; sys.path.insert(0, {str(root)!r}); "
            # config.update, not just the env var: the container's axon
            # sitecustomize forces its platform over JAX_PLATFORMS, and
            # during a tunnel outage axon backend discovery hangs forever
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "assert len(jax.devices()) == 1, jax.devices(); "
            "import importlib.util as u; "
            f"spec = u.spec_from_file_location('ge', {str(root / '__graft_entry__.py')!r}); "
            "m = u.module_from_spec(spec); spec.loader.exec_module(m); "
            "m.dryrun_multichip(8)"
        )
        proc = subprocess.run(
            [sys.executable, "-c", code],
            env=env,
            capture_output=True,
            text=True,
            timeout=900,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        assert "dryrun_multichip ok on 8 devices" in proc.stdout
