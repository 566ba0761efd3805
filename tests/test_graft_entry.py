"""Driver-contract checks: the multi-chip dry run executes on the CPU mesh."""

import importlib.util
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
