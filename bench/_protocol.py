"""Single source of the reference-default model configs and protocol-scale
synthetic inputs shared by the bench scripts.

The config values mirror the reference's per-script ``set_defaults``
(traintest_scripts/{varnet,cinenet,xpdnet}/train_test_*.py and the CRNN
chans in varnet_module.py:27 / recurrent_cinenet.py:29 /
xpdnet_module.py:27); keeping them in one place means a default change
cannot silently make two bench scripts measure different models.
"""

import numpy as np

PROTOCOL_SHAPE = (15, 10, 200, 200)  # (T, C, H, W), mri_data.py:272-277

CONFIGS = {
    "varnet": dict(num_cascades=10, sens_chans=8, sens_pools=3, chans=16, pools=3),
    "cinenet": dict(num_cascades=10, cg_iters=6, chans=16, pools=3),
    "xpdnet": dict(num_cascades=9, sens_chans=8, sens_pools=3, n_scales=3,
                   n_filters_per_scale=(16, 32, 64), n_primal=5),
}
CRNN_CONFIGS = {
    "varnet": dict(num_cascades=10, sens_chans=8, sens_pools=3, chans=16),
    "cinenet": dict(num_cascades=10, cg_iters=6, chans=16),
    "xpdnet": dict(num_cascades=9, sens_chans=8, sens_pools=3, chans=18, n_primal=5),
}


def model_kwargs(family: str, dyn: str) -> dict:
    """Reference-default build_model kwargs for a family/dynamic pair."""
    return dict((CRNN_CONFIGS if dyn == "CRNN" else CONFIGS)[family])


def protocol_inputs(shape=PROTOCOL_SHAPE, seed: int = 0, batch: int = 1):
    """Masked k-space (Complex) + mask at the protocol mask settings.

    Sub-protocol H can't fit the protocol's 10 center lines @4x; scale the
    mask down there so tiny smoke shapes work.
    """
    import jax.numpy as jnp

    from cinemri_tpu.data.masks import RandomMask
    from cinemri_tpu.ops.cplx import from_complex

    T, C, H, W = shape
    rng = np.random.default_rng(seed)
    k = (
        rng.standard_normal((batch, T, C, H, W))
        + 1j * rng.standard_normal((batch, T, C, H, W))
    ).astype(np.complex64)
    center, accel = ((10, 4) if H >= 64 else (4, 2))
    mask_np = np.stack(
        [RandomMask([center], [accel])(T, H, seed=seed + i) for i in range(batch)]
    )
    km = from_complex(k * mask_np)
    mask = jnp.asarray(mask_np.astype(np.float32))
    return km, mask


def rss_normalized_maps(shape=PROTOCOL_SHAPE, seed: int = 0, batch: int = 1):
    """Random RSS-normalized sensitivity maps (Complex) — compute-identical
    in shape/normalization to ESPIRiT output, for CineNet's external-maps
    signature (cinenet.py:154-156)."""
    from cinemri_tpu.ops.cplx import from_complex

    _, C, H, W = shape
    rng = np.random.default_rng(seed + 1)
    s = (
        rng.standard_normal((batch, 1, C, H, W))
        + 1j * rng.standard_normal((batch, 1, C, H, W))
    ).astype(np.complex64)
    s /= np.sqrt((np.abs(s) ** 2).sum(2, keepdims=True))
    return from_complex(s)
