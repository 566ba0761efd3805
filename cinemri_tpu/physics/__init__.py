"""MRI physics operators (encoding algebra, data consistency, CG)."""

from cinemri_tpu.physics.operators import (
    sens_expand,
    sens_reduce,
    apply_mask,
    soft_dc,
    normal_plus_lambda,
    is_line_mask,
    masked_normal_kernel,
    normal_plus_lambda_kernel,
    coil_weight,
    constrain_coil_axis,
    set_normal_backend,
    get_normal_backend,
    soft_dc_image_kernel,
    soft_sense_expand,
    soft_sense_reduce,
    soft_sense_rss,
    soft_sense_recon,
)
from cinemri_tpu.physics.cg import conj_grad
from cinemri_tpu.physics.lowfreq import (
    center_band,
    mask_center_band,
    low_frequency_kspace,
)

__all__ = [
    "sens_expand",
    "sens_reduce",
    "apply_mask",
    "soft_dc",
    "normal_plus_lambda",
    "is_line_mask",
    "masked_normal_kernel",
    "normal_plus_lambda_kernel",
    "coil_weight",
    "constrain_coil_axis",
    "set_normal_backend",
    "get_normal_backend",
    "soft_dc_image_kernel",
    "soft_sense_expand",
    "soft_sense_reduce",
    "soft_sense_rss",
    "soft_sense_recon",
    "conj_grad",
    "center_band",
    "mask_center_band",
    "low_frequency_kspace",
]
