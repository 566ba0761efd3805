"""K-space interpolation CNN for XPDNet's dual-buffer mode.

Parity target: reference reconstruction/models/denoisers/kspace_net.py:6-61 —
``n_convs`` Conv3d(+ReLU) layers over (t, h, w) applied per coil (the coil
axis is folded into the batch). Only used when XPDNet runs with
``primal_only=False``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["KSpaceCNN"]


class KSpaceCNN(nn.Module):
    """Input ``(b, t, c, h, w, in_chans)`` real -> ``(b, t, c, h, w, out_chans)``."""

    out_chans: int
    n_convs: int = 3
    n_filters: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, c, h, w, ch = x.shape
        # fold coil into batch; channels-last 3-D convs over (t, h, w)
        y = x.transpose(0, 2, 1, 3, 4, 5).reshape(b * c, t, h, w, ch)
        for i in range(self.n_convs - 1):
            y = nn.Conv(self.n_filters, (3, 3, 3), padding="SAME")(y)
            y = nn.relu(y)
        y = nn.Conv(self.out_chans, (3, 3, 3), padding="SAME")(y)
        return y.reshape(b, c, t, h, w, self.out_chans).transpose(0, 2, 1, 3, 4, 5)
