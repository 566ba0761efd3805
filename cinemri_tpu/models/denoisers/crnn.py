"""Convolutional RNN building blocks for the CRNN dynamic variants.

Parity target: reference reconstruction/models/recurrent_varnet.py:153-259
(CRNNcell / BCRNNlayer, duplicated verbatim in recurrent_cinenet.py and
recurrent_xpdnet.py — implemented once here).

TPU-first: the reference iterates Python loops over the t frames with
hardcoded ``.cuda()`` hidden-state allocations (recurrent_varnet.py:236);
here both temporal directions are ``nn.scan`` (lax.scan) sweeps sharing one
cell's parameters, so the whole bidirectional recurrence is a single
compiled loop with O(1) program size in t.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["CRNNCell", "BCRNN"]


class CRNNCell(nn.Module):
    """One CRNN step: relu(conv(x) + conv(h_time) + conv(h_iteration))
    (recurrent_varnet.py:153-200). Channels-last (b, h, w, ch)."""

    hidden_size: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, hidden, inputs):
        x, hidden_iteration = inputs
        k = (self.kernel_size, self.kernel_size)
        in_to_hid = nn.Conv(self.hidden_size, k, padding="SAME", name="i2h")(x)
        hid_to_hid = nn.Conv(self.hidden_size, k, padding="SAME", name="h2h")(hidden)
        ih_to_ih = nn.Conv(self.hidden_size, k, padding="SAME", name="ih2ih")(
            hidden_iteration
        )
        new_hidden = nn.relu(in_to_hid + hid_to_hid + ih_to_ih)
        return new_hidden, new_hidden


class BCRNN(nn.Module):
    """Bidirectional CRNN layer (recurrent_varnet.py:203-259).

    Args to ``__call__``:
        x: ``(t, b, h, w, ch)`` inputs.
        hidden_iteration: ``(t, b, h, w, hidden)`` — this layer's output at
            the previous unrolled iteration.
    Returns ``(t, b, h, w, hidden)`` = forward sweep + backward sweep, with
    one shared cell for both directions (reference uses a single CRNNcell).
    """

    hidden_size: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, hidden_iteration: jnp.ndarray) -> jnp.ndarray:
        t, b, h, w, _ = x.shape
        h0 = jnp.zeros((b, h, w, self.hidden_size), x.dtype)
        cell = nn.scan(
            CRNNCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )(hidden_size=self.hidden_size, kernel_size=self.kernel_size, name="cell")
        _, out_f = cell(h0, (x, hidden_iteration))
        _, out_b = cell(h0, (x[::-1], hidden_iteration[::-1]))
        return out_f + out_b[::-1]
