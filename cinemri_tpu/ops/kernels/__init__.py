"""Pallas TPU kernels for hot ops."""

from cinemri_tpu.ops.kernels.dft_pallas import (
    complex_dft_matmul_pallas,
    pallas_available,
)
from cinemri_tpu.ops.kernels.normal_pallas import normal_apply_pallas

__all__ = [
    "complex_dft_matmul_pallas",
    "pallas_available",
    "normal_apply_pallas",
]
