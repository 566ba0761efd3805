"""Pallas TPU kernels for hot ops."""

from cinemri_tpu.ops.kernels.dft_pallas import (
    complex_dft_matmul_pallas,
    pallas_available,
)

__all__ = ["complex_dft_matmul_pallas", "pallas_available"]
