"""cinemri_tpu — TPU-native dynamic cine cardiac MRI reconstruction.

A brand-new JAX / XLA / Pallas framework with the capabilities of the
PyTorch-Lightning reference f78bono/deep-cine-cardiac-mri: unrolled
cross-domain reconstruction networks (VarNet, CineNet, XPDNet), each in five
dynamic variants (2D / 3D / XT / XF / CRNN), trained with a time-averaged
SSIM loss on undersampled multi-coil cine k-space.

Design (TPU-first, not a port):
  * native ``complex64`` tensors (the reference carries a trailing real/imag
    dim of size 2 through every op);
  * channels-last convolutions (XLA's preferred TPU layout);
  * ``lax.scan`` cascades and CRNN recurrences instead of Python loops;
  * on-device conjugate-gradient (no per-iteration host syncs);
  * JAX-native ESPIRiT calibration (the reference shells out to BART's C
    ``ecalib`` inside every ``__getitem__``) plus a standalone C++ CPU
    calibration library for offline use;
  * data parallelism via ``jax.sharding.Mesh`` + jit shardings (the
    reference uses Lightning DP/DDP over NCCL).

Canonical array layouts (complex64 unless noted):
  * k-space              : ``(b, t, c, h, w)``    — h is the undersampled
                            (phase-encode) axis, matching the reference's
                            ``(b, t, c, Nx, Ny, 2)``.
  * sampling mask        : ``(b, t, 1, h, 1)`` float32 (equispaced masks
                            broadcast with t=1).
  * sensitivity maps     : ``(b, 1, c, h, w)``.
  * coil-combined image  : ``(b, t, h, w)``.
  * model output / target: ``(b, t, h, w)`` float32 magnitude.
"""

__version__ = "0.1.0"

from cinemri_tpu import ops, physics  # noqa: F401
