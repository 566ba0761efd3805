"""Numerics core (reference layer L0, reconstruction/utils/)."""

from cinemri_tpu.ops.fft import (
    set_dft_precision,
    fft1c,
    ifft1c,
    fft1c_alt,
    ifft1c_alt,
    fft2c,
    ifft2c,
    fftshift,
    ifftshift,
)
from cinemri_tpu.ops.complex import (
    to_real2,
    from_real2,
    complex_abs,
    complex_abs_sq,
    split_to_real_channels,
    merge_real_channels,
)
from cinemri_tpu.ops.coil import rss, rss_complex
from cinemri_tpu.ops.ssim import ssim_loss, ssim_index_per_frame
from cinemri_tpu.ops.pad import (
    pad_to_multiple,
    unpad,
    pad_for_mwcnn,
    unpad_from_mwcnn,
)
from cinemri_tpu.ops.wavelet import dwt2, iwt2
from cinemri_tpu.ops import metrics
from cinemri_tpu.ops import cplx
from cinemri_tpu.ops.cplx import Complex

__all__ = [
    "set_dft_precision",
    "fft1c",
    "ifft1c",
    "fft1c_alt",
    "ifft1c_alt",
    "fft2c",
    "ifft2c",
    "fftshift",
    "ifftshift",
    "to_real2",
    "from_real2",
    "complex_abs",
    "complex_abs_sq",
    "split_to_real_channels",
    "merge_real_channels",
    "rss",
    "rss_complex",
    "ssim_loss",
    "ssim_index_per_frame",
    "pad_to_multiple",
    "unpad",
    "pad_for_mwcnn",
    "unpad_from_mwcnn",
    "dwt2",
    "iwt2",
    "metrics",
    "cplx",
    "Complex",
]
