"""Convolutional RNN building blocks for the CRNN dynamic variants.

Parity target: reference reconstruction/models/recurrent_varnet.py:153-259
(CRNNcell / BCRNNlayer, duplicated verbatim in recurrent_cinenet.py and
recurrent_xpdnet.py — implemented once here).

TPU-first: the reference iterates Python loops over the t frames with
hardcoded ``.cuda()`` hidden-state allocations (recurrent_varnet.py:236);
here both temporal directions are ``nn.scan`` (lax.scan) sweeps sharing one
cell's parameters, so the whole bidirectional recurrence is a single
compiled loop with O(1) program size in t. The cell's three convs
(input->hidden, time-hidden->hidden, iteration-hidden->hidden,
recurrent_varnet.py:172-198) are algebraically one conv over the
channel-concatenated inputs — ``conv(x,Wx) + conv(h,Wh) + conv(g,Wg) =
conv([x,h,g], [Wx;Wh;Wg])`` — and at these channel counts (2+18+18 vs the
MXU's 128-lane contraction) the fused form costs one padded MXU pass
instead of three, so that is how the parameters are laid out here
(:func:`fused_sum_conv`; the torch weights port by in-axis concatenation
and bias summation).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = [
    "CRNNCell",
    "BCRNN",
    "fused_sum_conv",
    "fused_slice_sizes",
    "pack2",
    "unpack2",
]


def pack2(x: jnp.ndarray, block) -> jnp.ndarray:
    """Space-to-depth over the trailing (h, w) spatial dims of a
    (..., h, w, c) tensor (denoisers.packed_unet.pack with free leading
    batch dims)."""
    from cinemri_tpu.models.denoisers.packed_unet import pack

    lead = x.shape[:-3]
    h, w, c = x.shape[-3:]
    y = pack(x.reshape((-1, h, w, c)), block)
    return y.reshape(lead + y.shape[1:])


def unpack2(x: jnp.ndarray, block) -> jnp.ndarray:
    from cinemri_tpu.models.denoisers.packed_unet import unpack

    lead = x.shape[:-3]
    hq, wq, cp = x.shape[-3:]
    y = unpack(x.reshape((-1, hq, wq, cp)), block)
    return y.reshape(lead + y.shape[1:])


class _PackedFusedConv(nn.Module):
    """Packed-space execution of a fused sum-of-convs; the param tree
    ('kernel'/'bias', LOGICAL shapes, per-slice init) matches the plain
    nn.Conv that fused_sum_conv declares, so the packed and plain CRNN
    trunks are checkpoint-interchangeable."""

    features: int
    kernel_size: int
    sizes: tuple
    block: tuple
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cat_packed: jnp.ndarray) -> jnp.ndarray:
        from cinemri_tpu.models.denoisers.packed_unet import packed_conv

        k = self.kernel_size
        kernel = self.param(
            "kernel",
            _sliced_lecun_normal(self.sizes),
            (k, k, sum(self.sizes), self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return packed_conv(cat_packed, kernel, bias, self.block, dtype=self.dtype)


def fused_slice_sizes(name: str):
    """Parse the ``__f<s0>_<s1>...`` suffix a fused conv's name carries.

    Returns the per-input channel sizes, or None for ordinary convs. The
    suffix lets :func:`cinemri_tpu.models.init.torch_style_init` re-draw
    each input slice with the fan-in of the separate conv it replaces.
    """
    if "__f" not in name:
        return None
    return tuple(int(s) for s in name.rsplit("__f", 1)[1].split("_"))


def _sliced_lecun_normal(sizes):
    """Per-slice lecun_normal: each input slice gets the variance the
    separate conv it fuses would have (fan_in = k*k*slice), instead of one
    draw at fan_in = k*k*sum(sizes) which would start the narrow slices
    (e.g. the 2-channel image input vs 18-channel hiddens) ~3x too small."""

    def init(key, shape, dtype=jnp.float32):
        import jax

        keys = jax.random.split(key, len(sizes))
        parts = []
        for s, kk in zip(sizes, keys):
            parts.append(
                nn.initializers.lecun_normal()(
                    kk, shape[:-2] + (s, shape[-1]), dtype
                )
            )
        return jnp.concatenate(parts, axis=-2)

    return init


def fused_sum_conv(
    chans: int, kernel_size: int, name: str, *inputs, dtype=None, block=None
):
    """``sum_i conv_i(inputs[i])`` as ONE conv over concatenated channels.

    Exact up to f32 summation order; one MXU pass instead of len(inputs)
    mostly-padding passes when each input's contraction dim (3*3*ch) sits
    far below the MXU's 128 lanes.

    Initialization matches the separate convs it replaces: each input slice
    of the kernel is drawn with that slice's own fan-in (both here for the
    flax path and in ``models.init.torch_style_init`` via the ``__f``
    name suffix), and the bias — the sum of the separate convs' biases —
    starts at zero either way (flax default; torch_style_init re-draws it
    as a sum of per-conv uniforms).

    With ``block`` set, the inputs are already in (h, w)-space-to-depth
    packed form (c-major, same block) and the conv executes packed — exact,
    same parameters; the packed concat of c-major inputs IS the c-major
    packing of the logical concat.
    """
    k = (kernel_size, kernel_size)
    dt = dtype or jnp.float32
    B = 1
    if block is not None:
        for b in block:
            B *= b
    sizes = tuple(int(x.shape[-1]) // B for x in inputs)
    cat = inputs[0] if len(inputs) == 1 else jnp.concatenate(inputs, axis=-1)
    full_name = (
        name if len(inputs) == 1
        else f"{name}__f{'_'.join(str(s) for s in sizes)}"
    )
    from cinemri_tpu.models.remat import tag_conv_out

    if block is not None and B > 1:
        out = _PackedFusedConv(
            chans, kernel_size, sizes, tuple(block), dt, name=full_name
        )(cat)
    elif len(inputs) == 1:
        out = nn.Conv(chans, k, padding="SAME", dtype=dt, name=full_name)(cat)
    else:
        out = nn.Conv(
            chans,
            k,
            padding="SAME",
            dtype=dt,
            name=full_name,
            kernel_init=_sliced_lecun_normal(sizes),
        )(cat)
    return tag_conv_out(out)  # saveable under the "convs" remat policy


class CRNNCell(nn.Module):
    """One CRNN step: relu(conv(x) + conv(h_time) + conv(h_iteration))
    (recurrent_varnet.py:153-200), computed as one fused conv (module
    docstring). Channels-last (b, h, w, ch)."""

    hidden_size: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32
    block: tuple = ()  # packed (h, w) space-to-depth block, () = dense

    @nn.compact
    def __call__(self, hidden, inputs):
        x, hidden_iteration = inputs
        new_hidden = nn.relu(
            fused_sum_conv(
                self.hidden_size, self.kernel_size, "i2h_h2h_ih2ih",
                x, hidden, hidden_iteration, dtype=self.dtype,
                block=self.block or None,
            )
        )
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
    dtype: jnp.dtype = jnp.float32
    block: tuple = ()  # packed (h, w) block; x/hidden_iteration arrive packed
    # (A time-sweep scan-unroll knob was tried here and measured a wash on
    # the chip — 71.5 vs 72.2 ms; BASELINE.md "Perf-tail profiles" — so the
    # scan stays at unroll=1 with no dead configuration surface.)

    @nn.compact
    def __call__(self, x: jnp.ndarray, hidden_iteration: jnp.ndarray) -> jnp.ndarray:
        t, b, hq, wq, _ = x.shape
        B = 1
        for bb in self.block:
            B *= bb
        h0 = jnp.zeros((2 * b, hq, wq, self.hidden_size * B), self.dtype)
        x = x.astype(self.dtype)
        hidden_iteration = hidden_iteration.astype(self.dtype)
        # Both temporal directions ride ONE scan, stacked on the batch axis
        # (the reference runs one shared cell each way,
        # recurrent_varnet.py:236-256): per-sample conv results are
        # direction-independent, so this is the same math with half the
        # sequential scan steps and twice the per-step conv batch — the
        # CRNN tail rows are dispatch-bound, not FLOP-bound (BASELINE.md
        # "Perf-tail profiles").
        xx = jnp.concatenate([x, x[::-1]], axis=1)  # (t, 2b, hq, wq, ch)
        hh = jnp.concatenate([hidden_iteration, hidden_iteration[::-1]], axis=1)
        cell = nn.scan(
            CRNNCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )(hidden_size=self.hidden_size, kernel_size=self.kernel_size,
          dtype=self.dtype, block=self.block, name="cell")
        _, out = cell(h0, (xx, hh))
        return out[:, :b] + out[:, b:][::-1]
