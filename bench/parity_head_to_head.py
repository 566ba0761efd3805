"""Head-to-head trained-metric parity: the reference (PyTorch, CPU) vs this
framework, trained side by side on identical data, masks, initial weights,
and optimizer schedule; reports ΔSSIM / ΔNMSE on a held-out volume.

Protocol (the reduced form of the reference's own training protocol):
  * VarNet-XF, 4 cascades, chans 8, pools 2, sens 4/2 — the flagship family
    at a CPU-tractable size (reference defaults: train_test_varnet.py:249-262).
  * 3 synthetic beating-phantom training volumes + 1 held-out test volume
    (8 frames x 4 coils x 64x64), targets synthesized from the true coil
    maps exactly as the reference does from ESPIRiT maps
    (mri_data.py:302-303).
  * random Cartesian masks @4x with 8 center lines, drawn per (epoch,
    volume) from fixed seeds and fed as the SAME numpy arrays to both sides
    (the reference's per-epoch random masking, transforms.py:327-330).
  * SSIM training loss with the reference's quirks (per-frame data_range
    from the target max — losses.py:34 overwrites the passed value), Adam
    lr=1e-4 (varnet_module.py:151-159; StepLR(140) never fires at 30
    epochs), batch 1, fixed volume order on both sides.
  * both models start from the SAME weights: the torch model's
    reset_parameters() init is ported into the flax parameter tree with the
    test-suite's weight movers.
  * eval: SSIM/NMSE via this repo's skimage-parity metrics
    (utils/evaluate.py:25-42 semantics), same fixed test mask on both sides.

The torch side drives the reference's own modules (read-only import with
BART stubbed and the hardcoded ``.to('cuda')`` in losses.py:34 routed to
CPU); nothing is reimplemented on that side, so its numbers ARE the
reference's. Usage: python bench/parity_head_to_head.py [--epochs 30]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

T, C, H, W = 8, 4, 64, 64
TRAIN_SEEDS = (0, 1, 2)
TEST_SEED = 3
TEST_MASK_SEED = 424242
MODEL_KW = dict(num_cascades=4, sens_chans=4, sens_pools=2, chans=8, pools=2)


def make_volumes():
    from cinemri_tpu.data.synthetic import synthetic_volume

    def vol(seed):
        v = synthetic_volume(T, C, H, W, noise=2e-3, seed=seed)
        # target exactly as the reference synthesizes it from calibration
        # maps (mri_data.py:302-303): |sum_c IFFT(k)_c * conj(S_c)|
        imgs = np.fft.fftshift(
            np.fft.ifft2(np.fft.ifftshift(v["kspace"], axes=(-2, -1)), norm="ortho"),
            axes=(-2, -1),
        )
        target = np.abs((imgs * np.conj(v["sens"][None])).sum(axis=1)).astype(
            np.float32
        )
        return v["kspace"][None], target[None]  # batch of 1

    return [vol(s) for s in TRAIN_SEEDS], vol(TEST_SEED)


def make_masks(epochs):
    from cinemri_tpu.data.masks import RandomMask

    mk = RandomMask([8], [4])
    train_masks = [
        [
            mk(T, H, seed=100_000 + 1_000 * e + v)[None].astype(np.float32)
            for v in range(len(TRAIN_SEEDS))
        ]
        for e in range(epochs)
    ]
    test_mask = mk(T, H, seed=TEST_MASK_SEED)[None].astype(np.float32)
    return train_masks, test_mask  # (1, t, 1, h, 1) float


class _cpu_to:
    """Route the reference's hardcoded ``.to('cuda')`` (losses.py:34) to CPU."""

    def __enter__(self):
        import torch

        self._orig = torch.Tensor.to

        def to(tensor, *args, **kwargs):
            args = tuple("cpu" if a == "cuda" else a for a in args)
            if kwargs.get("device") == "cuda":
                kwargs["device"] = "cpu"
            return self._orig(tensor, *args, **kwargs)

        torch.Tensor.to = to
        return self

    def __exit__(self, *exc):
        import torch

        torch.Tensor.to = self._orig
        return False


def port_initial_params(torch_model):
    """Snapshot the torch model's CURRENT weights as a flax parameter tree
    (must run before the reference trains, so both sides share the init)."""
    import _torch_ref as tr

    cascades = {
        "net_xf": tr.norm_unet_params(torch_model.model[0]),
        "net_yf": tr.norm_unet_params(torch_model.model[1]),
    }
    lam = np.asarray(
        [blk.lambda_reg.detach().numpy()[0] for blk in torch_model.cascades],
        np.float32,
    )
    return {
        "params": {
            "sens_net": tr.sens_model_params(torch_model.sens_net),
            "cascades": cascades,
            "lambda_reg": lam,
        }
    }


def run_reference(train, test, train_masks, test_mask, epochs):
    import torch
    import _torch_ref as tr

    ref = tr.load_reference()
    from reconstruction.utils.losses import SSIMLoss

    torch.manual_seed(42)
    model = ref.varnet.VarNet(dynamic_type="XF", **MODEL_KW)
    init_params = port_initial_params(model)
    loss_fn = SSIMLoss()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4, weight_decay=0.0)

    losses = []
    with _cpu_to():
        for e in range(epochs):
            tot = 0.0
            for v, (k, target) in enumerate(train):
                m = train_masks[e][v]
                kt = tr.to_torch_complex6(k * m)
                mt = tr.mask_to_torch(m)
                tt = torch.from_numpy(target)
                opt.zero_grad()
                out = model(kt, mt)
                loss = loss_fn(
                    out.unsqueeze(1), tt.unsqueeze(1),
                    data_range=torch.tensor([float(target.max())]),
                )
                loss.backward()
                opt.step()
                tot += float(loss.detach())
            losses.append(tot / len(train))

        k, target = test
        with torch.no_grad():
            out = model(
                tr.to_torch_complex6(k * test_mask), tr.mask_to_torch(test_mask)
            ).numpy()
    return init_params, out[0], target[0], losses


def run_framework(params, train, test, train_masks, test_mask, epochs):
    import jax
    import jax.numpy as jnp
    import optax

    from cinemri_tpu.models import build_model
    from cinemri_tpu.ops.cplx import from_complex
    from cinemri_tpu.ops.ssim import ssim_loss
    from cinemri_tpu.train import make_optimizer

    model = build_model("varnet", "XF", **MODEL_KW)
    tx = make_optimizer(lr=1e-4, lr_step_size=10**6, steps_per_epoch=1)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, kb, mb, tb):
        def loss_fn(p):
            out = model.apply(p, kb, mb)
            return ssim_loss(out, tb)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for e in range(epochs):
        tot = 0.0
        for v, (k, target) in enumerate(train):
            m = train_masks[e][v]
            params, opt_state, loss = step(
                params, opt_state, from_complex(k * m), jnp.asarray(m),
                jnp.asarray(target),
            )
            tot += float(loss)
        losses.append(tot / len(train))

    k, target = test
    out = np.asarray(
        jax.jit(model.apply)(params, from_complex(k * test_mask), jnp.asarray(test_mask))
    )
    return out[0], target[0], losses


def main(epochs: int = 30):
    from cinemri_tpu.ops import metrics as M

    train, test = make_volumes()
    train_masks, test_mask = make_masks(epochs)

    t0 = time.perf_counter()
    init_params, out_ref, target, ref_losses = run_reference(
        train, test, train_masks, test_mask, epochs
    )
    ref_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    out_jax, _, jax_losses = run_framework(
        init_params, train, test, train_masks, test_mask, epochs
    )
    jax_s = time.perf_counter() - t0

    maxval = float(target.max())
    ssim_ref = M.ssim(target, out_ref, maxval=maxval)
    ssim_jax = M.ssim(target, out_jax, maxval=maxval)
    nmse_ref = M.nmse(target, out_ref)
    nmse_jax = M.nmse(target, out_jax)
    print(
        json.dumps(
            {
                "epochs": epochs,
                "ssim_reference": round(float(ssim_ref), 5),
                "ssim_framework": round(float(ssim_jax), 5),
                "delta_ssim": round(float(ssim_jax - ssim_ref), 5),
                "nmse_reference": round(float(nmse_ref), 6),
                "nmse_framework": round(float(nmse_jax), 6),
                "delta_nmse": round(float(nmse_jax - nmse_ref), 6),
                "first_epoch_loss": [round(ref_losses[0], 5), round(jax_losses[0], 5)],
                "last_epoch_loss": [round(ref_losses[-1], 5), round(jax_losses[-1], 5)],
                "reference_train_minutes": round(ref_s / 60, 2),
                "framework_train_minutes": round(jax_s / 60, 2),
            }
        )
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    main(ap.parse_args().epochs)
