"""Layout hypothesis probe for the 3-D U-Net variants (design.md §9).

The diagnosis: XLA assigns the U-Net's 16-channel activations 16-in-128-lane
tiled layouts, so every elementwise/norm pass pays ~8x its logical HBM
traffic. The candidate fix is computing the conv stack in a space-to-depth
("packed") representation that multiplies channels by 4 (h,w blocks) or 8
(t,h,w) at the cost of 4x/8x denser conv kernels — worth it iff the chip is
bandwidth-bound, which this probe measures directly: an A/B of an
equal-logical-work ConvBlock chain in the three layouts (same element
count, channel width 16 vs 64 vs 128), f32 and bf16.

Prints one JSON line per configuration. Usage: python bench/layout_probe.py
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from cinemri_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    class Chain(nn.Module):
        ch: int
        n_layers: int = 4
        groups: int = 16  # InstanceNorm groups = number of LOGICAL channels

        @nn.compact
        def __call__(self, x):
            for _ in range(self.n_layers):
                x = nn.Conv(self.ch, (3, 3, 3), padding="SAME", use_bias=False)(x)
                x = nn.GroupNorm(
                    num_groups=self.groups, epsilon=1e-5,
                    use_bias=False, use_scale=False,
                )(x)
                x = nn.leaky_relu(x, negative_slope=0.2)
            return x

    shapes = {
        # same logical element count (16*208*208*16), increasing lane width
        "base_16ch": ((1, 16, 208, 208, 16), 16),
        "packed_hw_64ch": ((1, 16, 104, 104, 64), 64),
        "packed_thw_128ch": ((1, 8, 104, 104, 128), 128),
    }

    results = {}
    for dtype_name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        for name, (shape, ch) in shapes.items():
            x = jnp.asarray(
                np.random.default_rng(0).standard_normal(shape), dtype
            )
            model = Chain(ch=ch, groups=16)
            params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
            if dtype == jnp.bfloat16:
                params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
            f = jax.jit(lambda p, v: jnp.sum(model.apply(p, v).astype(jnp.float32)))
            float(f(params, x))  # compile+warm
            n = 30
            t0 = time.perf_counter()
            vals = [f(params, x) for _ in range(n)]
            float(vals[-1])
            dt = (time.perf_counter() - t0) / n
            results[f"{name}_{dtype_name}"] = round(dt * 1e3, 3)

    print(json.dumps({"unit": "ms_per_call", **results}))


if __name__ == "__main__":
    main()
