"""Op-level TPU profile analysis from ``jax.profiler`` trace captures.

The reference has no profiler at all (SURVEY §5); :func:`instrument.trace`
captures xplane protos, and this module answers "where did the time go"
without TensorBoard: it parses the device plane and aggregates XLA-op
durations by name or by op kind. This is the harness behind the serving
batch-regression analysis in BASELINE.md ("Why joint batching loses").

Requires the ``tensorflow`` xplane protos (present in this container for
parsing only — nothing here runs TF compute). Import is deferred and
guarded so the package works without it.
"""

from __future__ import annotations

import glob
import re
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

__all__ = ["load_xspace", "op_durations", "durations_by_kind", "top_ops"]

_DEVICE_PLANE = "/device:TPU:0"
_OPS_LINE = "XLA Ops"


def _xplane_pb2():
    import os

    # the generated protos predate protobuf 5's C++ check; pure-python
    # parsing works and this is an offline analysis path
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError as e:  # pragma: no cover - depends on container
        raise ImportError(
            "instrument.opstats needs the tensorflow xplane protos "
            "(pip package 'tensorflow' or 'tsl'); trace analysis is "
            "optional and nothing else in cinemri_tpu requires it"
        ) from e
    return xplane_pb2


def load_xspace(trace_dir: Union[str, Path]):
    """Load the XSpace proto from a ``instrument.trace`` output directory."""
    pattern = str(Path(trace_dir) / "plugins" / "profile" / "*" / "*.xplane.pb")
    hits = sorted(glob.glob(pattern)) or [str(trace_dir)]  # allow direct file
    xs = _xplane_pb2().XSpace()
    with open(hits[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def op_durations(
    trace_dir: Union[str, Path],
    runs: int = 1,
    device_plane: str = _DEVICE_PLANE,
    include_loops: bool = False,
    include_async_copies: bool = False,
) -> Dict[str, float]:
    """Total duration (ms, divided by ``runs``) per XLA op name.

    ``%while`` wrappers double-count their body and async copy-start/done
    durations span scheduling windows rather than occupancy, so both are
    excluded by default.
    """
    xs = load_xspace(trace_dir)
    agg: Dict[str, float] = defaultdict(float)
    for plane in xs.planes:
        if plane.name != device_plane:
            continue
        names = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != _OPS_LINE:
                continue
            for ev in line.events:
                name = names.get(ev.metadata_id, "")
                if not include_loops and name.startswith("%while"):
                    continue
                if not include_async_copies and (
                    "copy-start" in name or "copy-done" in name
                ):
                    continue
                agg[name] += ev.duration_ps / 1e9 / runs
    return dict(agg)


def fold_by_kind(durations: Dict[str, float]) -> Dict[str, float]:
    """Fold per-op durations to op kinds (fusion, convolution, dot, ...)."""
    out: Dict[str, float] = defaultdict(float)
    for name, ms in durations.items():
        m = re.match(r"%([a-zA-Z_\-]+)", name)
        kind = m.group(1) if m else name[:24]
        if "convolution" in name:
            kind = "convolution"
        out[kind] += ms
    return dict(out)


def sort_top(durations: Dict[str, float], n: int = 20) -> List[Tuple[str, float]]:
    """The n most expensive ops as (name, ms/run), descending."""
    return sorted(durations.items(), key=lambda kv: -kv[1])[:n]


def durations_by_kind(
    trace_dir: Union[str, Path], runs: int = 1, **kw
) -> Dict[str, float]:
    """Op durations folded to op kinds (fusion, convolution, dot, copy, ...)."""
    return fold_by_kind(op_durations(trace_dir, runs, **kw))


def top_ops(
    trace_dir: Union[str, Path], runs: int = 1, n: int = 20, **kw
) -> List[Tuple[str, float]]:
    """The n most expensive ops as (name, ms/run), descending."""
    return sort_top(op_durations(trace_dir, runs, **kw), n)
