"""Model layer: 3 unrolled families x 5 dynamic variants (2D/3D/XT/XF/CRNN).

Reference layer L2 (reconstruction/models/). Factory helpers build the right
class for a ``dynamic_type`` string, mirroring the Lightning modules'
dispatch (varnet_module.py:74-90 etc.).
"""

from cinemri_tpu.models.varnet import VarNet, VarNetCascade, SensitivityModel
from cinemri_tpu.models.cinenet import CineNet, CineNetCascade
from cinemri_tpu.models.xpdnet import XPDNet, XPDNetBlock, XPDNetSensitivityModel
from cinemri_tpu.models.recurrent import VarNetRNN, CineNetRNN, XPDNetRNN, CRNNTrunk
from cinemri_tpu.models import denoisers
from cinemri_tpu.models.init import torch_style_init

__all__ = [
    "VarNet",
    "VarNetCascade",
    "SensitivityModel",
    "CineNet",
    "CineNetCascade",
    "XPDNet",
    "XPDNetBlock",
    "XPDNetSensitivityModel",
    "VarNetRNN",
    "CineNetRNN",
    "XPDNetRNN",
    "CRNNTrunk",
    "denoisers",
    "build_model",
    "torch_style_init",
]


def build_model(family: str, dynamic_type: str = "XF", **kwargs):
    """Build a model by family ('varnet'|'cinenet'|'xpdnet') and dynamic type.

    Mirrors the reference Lightning modules' CRNN-vs-unrolled dispatch
    (varnet_module.py:74-90, cinenet_module.py:68-82, xpdnet_module.py:103-131).
    Keyword args are forwarded; unknown keys for the selected class raise.
    """
    family = family.lower()
    allowed = {
        "varnet": ("2D", "3D", "XT", "XF", "CRNN"),
        "cinenet": ("2D", "3D", "XT", "XF", "CRNN"),
        "xpdnet": ("2D", "XT", "XF", "CRNN"),  # 3D excluded (xpdnet_module.py:100-101)
    }
    if family in allowed and dynamic_type not in allowed[family]:
        raise ValueError(
            f"dynamic_type {dynamic_type!r} not supported for {family}: {allowed[family]}"
        )
    if family == "varnet":
        if dynamic_type == "CRNN":
            return VarNetRNN(**kwargs)
        return VarNet(dynamic_type=dynamic_type, **kwargs)
    if family == "cinenet":
        if dynamic_type == "CRNN":
            return CineNetRNN(**kwargs)
        return CineNet(dynamic_type=dynamic_type, **kwargs)
    if family == "xpdnet":
        if dynamic_type == "CRNN":
            return XPDNetRNN(**kwargs)
        return XPDNet(dynamic_type=dynamic_type, **kwargs)
    raise ValueError(f"unknown model family {family!r}")
