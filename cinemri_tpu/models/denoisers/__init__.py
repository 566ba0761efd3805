"""Denoiser zoo shared by the unrolled model families."""

from cinemri_tpu.models.denoisers.unet import Unet, ConvBlock, TransposeConvBlock
from cinemri_tpu.models.denoisers.norm_unet import NormUnet, NormUnet3D
from cinemri_tpu.models.denoisers.mwcnn import MWCNN, MWConvBlock
from cinemri_tpu.models.denoisers.kspace_cnn import KSpaceCNN
from cinemri_tpu.models.denoisers.crnn import CRNNCell, BCRNN

__all__ = [
    "Unet",
    "ConvBlock",
    "TransposeConvBlock",
    "NormUnet",
    "NormUnet3D",
    "MWCNN",
    "MWConvBlock",
    "KSpaceCNN",
    "CRNNCell",
    "BCRNN",
]
