"""Helpers for numerical parity tests against the reference PyTorch models.

Loads the read-only reference at /root/reference (stubbing its module-scope
BART import, which the forward paths never call) and converts torch weights
into this framework's flax parameter trees. Used only by
tests/test_reference_parity.py — nothing here ships in the package.
"""

from __future__ import annotations

import sys
import types

import numpy as np

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


# ------------------------------------------------------------ weight movers


def conv_w(m) -> dict:
    """torch ConvNd -> flax Conv params (OIHW/OIDHW -> HWIO/DHWIO).

    Copies: ``.detach().numpy()`` shares the tensor's buffer, so in-place
    torch optimizer steps would otherwise mutate the exported params.
    """
    w = m.weight.detach().numpy()
    axes = tuple(range(2, w.ndim)) + (1, 0)
    out = {"kernel": np.ascontiguousarray(np.transpose(w, axes))}
    if m.bias is not None:
        out["bias"] = m.bias.detach().numpy().copy()
    return out


def convT_w(m) -> dict:
    """torch ConvTransposeNd -> flax ConvTranspose params.

    torch stores (I, O, *k) and computes a correlation of the dilated input
    with the *flipped* kernel; flax's ConvTranspose (transpose_kernel=False)
    uses the unflipped kernel, so flip all spatial axes.
    """
    w = m.weight.detach().numpy()
    spatial = tuple(range(2, w.ndim))
    w = np.flip(w, axis=spatial)
    axes = spatial + (0, 1)
    return {"kernel": np.ascontiguousarray(np.transpose(w, axes))}


def convblock_params(tcb) -> dict:
    """reference ConvBlock (unet.py:128-182): convs at layers[0], layers[4]."""
    return {"Conv_0": conv_w(tcb.layers[0]), "Conv_1": conv_w(tcb.layers[4])}


def transposeblock_params(tb) -> dict:
    return {"ConvTranspose_0": convT_w(tb.layers[0])}


def unet_params(tunet) -> dict:
    """reference Unet -> flax Unet params['params'] dict."""
    p = {}
    pools = tunet.num_pool_layers
    for j, blk in enumerate(tunet.down_sample_layers):
        p[f"ConvBlock_{j}"] = convblock_params(blk)
    p[f"ConvBlock_{pools}"] = convblock_params(tunet.conv)
    for i in range(pools):
        p[f"TransposeConvBlock_{i}"] = transposeblock_params(tunet.up_transpose_conv[i])
        if i < pools - 1:
            p[f"ConvBlock_{pools + 1 + i}"] = convblock_params(tunet.up_conv[i])
        else:
            seq = tunet.up_conv[i]
            p[f"ConvBlock_{2 * pools}"] = convblock_params(seq[0])
            p["Conv_0"] = conv_w(seq[1])
    return p


def norm_unet_params(tnu) -> dict:
    return {"Unet_0": unet_params(tnu.unet)}


def sens_model_params(tsm) -> dict:
    """reference varnet.SensitivityModel -> flax SensitivityModel params."""
    return {"NormUnet_0": norm_unet_params(tsm.norm_unet)}


def mwcnn_params(tm) -> dict:
    """reference MWCNN -> flax MWCNN params (creation-order MWConvBlocks)."""
    p = {}
    idx = 0

    def add_block(tcb):
        nonlocal idx
        p[f"MWConvBlock_{idx}"] = {"Conv_0": conv_w(tcb.layers[0])}
        idx += 1

    n_first = tm.n_first_convs
    if n_first > 0:
        for blk in tm.first_convs[:n_first]:
            add_block(blk)
    for i_scale in range(tm.n_scales):
        n = tm.n_convs_per_scale[i_scale]
        for blk in tm.conv_blocks_per_scale[i_scale][:n]:
            add_block(blk)
    plain = {}
    for i_scale in range(tm.n_scales - 1, -1, -1):
        n = tm.n_convs_per_scale[i_scale]
        for k, blk in enumerate(tm.conv_blocks_per_scale[i_scale][n:]):
            is_last = i_scale == 0 and k == n - 1
            if is_last and n_first < 1:
                plain["Conv_0"] = conv_w(blk)  # replaced by plain conv
            else:
                add_block(blk)
    if n_first > 0:
        for blk in tm.first_convs[n_first:-1]:
            add_block(blk)
        plain["Conv_0"] = conv_w(tm.first_convs[-1])
    p.update(plain)
    return p


def fused_conv_w(*mods) -> dict:
    """Sum-of-convs -> the framework's fused single conv: kernels concatenate
    along the input-channel axis (matching the input concat order) and
    biases sum (see cinemri_tpu.models.denoisers.crnn.fused_sum_conv)."""
    parts = [conv_w(m) for m in mods]
    out = {"kernel": np.concatenate([p["kernel"] for p in parts], axis=-2)}
    if "bias" in parts[0]:
        out["bias"] = np.sum([p["bias"] for p in parts], axis=0)
    return out


def fused_name(base: str, *mods) -> str:
    """Fused-conv module name with the ``__f<sizes>`` input-slice suffix
    (crnn.fused_sum_conv naming convention)."""
    sizes = [m.weight.shape[1] for m in mods]
    return f"{base}__f{'_'.join(str(s) for s in sizes)}"


def crnn_trunk_params(tmodel) -> dict:
    """reference VarNet_RNN conv trunk + BCRNN -> flax CRNNTrunk params."""
    cell = tmodel.bcrnn.CRNN_model
    return {
        "bcrnn": {
            "cell": {
                # fused conv input order: (x, hidden_time, hidden_iteration)
                fused_name("i2h_h2h_ih2ih", cell.i2h, cell.h2h, cell.ih2ih):
                    fused_conv_w(cell.i2h, cell.h2h, cell.ih2ih),
            }
        },
        fused_name("conv1_xh", tmodel.conv1_x, tmodel.conv1_h):
            fused_conv_w(tmodel.conv1_x, tmodel.conv1_h),
        fused_name("conv2_xh", tmodel.conv2_x, tmodel.conv2_h):
            fused_conv_w(tmodel.conv2_x, tmodel.conv2_h),
        fused_name("conv3_xh", tmodel.conv3_x, tmodel.conv3_h):
            fused_conv_w(tmodel.conv3_x, tmodel.conv3_h),
        "conv4_x": conv_w(tmodel.conv4_x),
    }


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
