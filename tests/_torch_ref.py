"""Helpers for numerical parity tests against the reference PyTorch models.

Loads the read-only reference at /root/reference (stubbing its module-scope
BART import, which the forward paths never call). The torch->flax weight
movers themselves ship in ``cinemri_tpu.interop.port`` (they power the
user-facing checkpoint import) and are re-exported here so the parity tests
exercise the shipped code against live reference modules.
"""

from __future__ import annotations

import sys
import types

import numpy as np

from cinemri_tpu.interop.port import (  # noqa: F401  (re-exports for tests)
    conv_w,
    convT_w,
    convblock_params,
    transposeblock_params,
    unet_params,
    norm_unet_params,
    sens_model_params,
    mwcnn_params,
    kspace_cnn_params,
    fused_conv_w,
    fused_name,
    crnn_trunk_params,
)

REFERENCE = "/root/reference"


def load_reference():
    """Import the reference package with BART stubbed; returns its modules."""
    if "bart" not in sys.modules:
        stub = types.ModuleType("bart")
        stub.bart = lambda *a, **k: None
        sys.modules["bart"] = stub
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import reconstruction.utils  # noqa: F401  (registers rec.utils)
    import reconstruction.models.varnet as rvarnet
    import reconstruction.models.cinenet as rcinenet
    import reconstruction.models.xpdnet as rxpdnet
    import reconstruction.models.recurrent_varnet as rrec_varnet
    import reconstruction.models.recurrent_cinenet as rrec_cinenet
    import reconstruction.models.recurrent_xpdnet as rrec_xpdnet
    from reconstruction.models.denoisers import norm_unet as rnorm_unet
    from reconstruction.models.denoisers import unet as runet
    from reconstruction.models.denoisers import mwcnn as rmwcnn

    return types.SimpleNamespace(
        varnet=rvarnet,
        cinenet=rcinenet,
        xpdnet=rxpdnet,
        recurrent_varnet=rrec_varnet,
        recurrent_cinenet=rrec_cinenet,
        recurrent_xpdnet=rrec_xpdnet,
        unet=runet,
        norm_unet=rnorm_unet,
        mwcnn=rmwcnn,
    )


# ------------------------------------------------------------ tensor movers


def to_torch_complex6(x: np.ndarray):
    """numpy complex (b, t, c, h, w) -> torch (b, t, c, h, w, 2) float."""
    import torch

    return torch.from_numpy(
        np.stack([x.real, x.imag], axis=-1).astype(np.float32)
    )


def mask_to_torch(mask: np.ndarray):
    """(b, t, 1, h, 1) f32 -> torch (b, t, 1, h, 1, 1) byte."""
    import torch

    return torch.from_numpy(mask[..., None].astype(np.uint8))
