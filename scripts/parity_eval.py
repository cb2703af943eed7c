#!/usr/bin/env python
"""Cross-framework quality-parity gate (BASELINE.md: ≤0.1 dB PSNR delta).

Takes a TRAINED checkpoint from this framework, exports its UNet weights
into the reference PyTorch implementation (read-only, ``/root/reference``),
and runs BOTH full LCM samplers over a paired eval set with identical
injected noise.  Reports PSNR/SSIM per framework per image and the deltas —
the direct measurement of the "≤0.1 dB vs the PyTorch reference" gate on
real trained weights (not random-init parity, which ``tests/test_torch_parity``
already covers).

Both sides run f32 on CPU so the comparison is numerics-for-numerics:

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/parity_eval.py \
        --data_dir data/synth_lol/val \
        --model checkpoints/quality_teacher/best_model \
        --variant small --image_size 128 --use_ema

Reference surfaces exercised: ``src/models/efficient_unet.py`` (full UNet),
``src/models/lcm_scheduler.py`` (set_timesteps/step/add_noise),
``src/models/low_light_diffusion.py:177-248`` (the enhance loop semantics).
"""

import argparse
import importlib.util
import sys
import types
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

REF_UNET = "/root/reference/src/models/efficient_unet.py"
REF_SCHED = "/root/reference/src/models/lcm_scheduler.py"


def load_reference():
    """Import the reference UNet + scheduler modules (diffusers stubbed)."""
    if "diffusers" not in sys.modules:
        d = types.ModuleType("diffusers")
        cu = types.ModuleType("diffusers.configuration_utils")

        class SchedulerMixin:
            pass

        class ConfigMixin:
            pass

        def register_to_config(f):
            import inspect

            def wrapper(self, *a, **k):
                sig = inspect.signature(f)
                bound = sig.bind(self, *a, **k)
                bound.apply_defaults()
                self.config = types.SimpleNamespace(
                    **{n: v for n, v in list(bound.arguments.items())[1:]})
                return f(self, *a, **k)

            return wrapper

        d.SchedulerMixin = SchedulerMixin
        cu.ConfigMixin = ConfigMixin
        cu.register_to_config = register_to_config
        sys.modules["diffusers"] = d
        sys.modules["diffusers.configuration_utils"] = cu

    mods = []
    for name, path in [("ref_eu", REF_UNET), ("ref_lcm", REF_SCHED)]:
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mods.append(mod)
    return mods


def main():
    p = argparse.ArgumentParser(description="cross-framework parity eval")
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--model", type=str, required=True,
                   help="training checkpoint dir (orbax)")
    p.add_argument("--variant", type=str, default="small")
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--num_steps", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--prediction", type=str, default=None,
                   choices=["epsilon", "v_prediction"],
                   help="prediction target; default: auto-detect from the "
                        "checkpoint (trainer_meta/model_config)")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # f32-for-f32 vs torch CPU
    import jax.numpy as jnp
    import torch

    from cv_diffusion_tpu.config import diffusion_config, unet_config
    from cv_diffusion_tpu.models import create_model, enhance, \
        denormalize_image
    from cv_diffusion_tpu.data import LowLightDataset, DataLoader
    from cv_diffusion_tpu.training import checkpoint as ckpt
    from cv_diffusion_tpu.training.metrics import psnr, ssim
    from cv_diffusion_tpu.utils.torch_compat import export_unet_state_dict

    steps = args.num_steps
    size = args.image_size

    # Auto-detect the trained prediction target — running a v-prediction
    # checkpoint through the ε path on either side silently produces
    # garbage, so the gate must configure BOTH frameworks consistently
    # (the reference scheduler supports both:
    # ``src/models/lcm_scheduler.py:60,215-222``).
    pred_type = (args.prediction
                 or ckpt.load_prediction_type(args.model) or "epsilon")
    print(f"prediction_type: {pred_type}")
    detected = ckpt.detect_variant(args.model)
    if detected and detected != args.variant:
        print(f"Variant: {detected} (auto-detected from artifact)")
        args.variant = detected

    # ---- our side: trained params, f32 ---------------------------------
    cfg = diffusion_config(args.variant, image_size=size,
                           num_inference_steps=steps, dtype="float32",
                           prediction_type=pred_type)
    model, schedule = create_model(cfg)
    loaded = ckpt.load_inference_params(args.model, use_ema=args.use_ema)
    params = jax.tree_util.tree_map(
        lambda a: np.asarray(a, dtype=np.float32), loaded)
    unet_params = params["unet"] if "unet" in params else params

    enh = jax.jit(lambda v, x, ini, stp: enhance(
        model, schedule, {"params": v}, jax.random.key(0), x,
        num_inference_steps=steps, init_noise=ini, step_noise=stp))

    # ---- reference side: same weights in the torch implementation ------
    ref_eu, ref_lcm = load_reference()
    tmodel = ref_eu.create_efficient_unet(args.variant, image_size=size,
                                          in_channels=6)
    ucfg = unet_config(args.variant, image_size=size, in_channels=6)
    sd = export_unet_state_dict(unet_params, ucfg)
    tmodel.load_state_dict({k: torch.tensor(v) for k, v in sd.items()},
                           strict=True)
    tmodel.eval()
    scheduler = ref_lcm.LCMScheduler(rescale_betas_zero_snr=True,
                                     prediction_type=pred_type)
    scheduler.set_timesteps(steps)
    timesteps = scheduler.timesteps.tolist()

    ds = LowLightDataset(args.data_dir, image_size=size, augment_data=False)
    loader = DataLoader(ds, batch_size=1)

    def to01(x_nhwc):
        return np.clip(np.asarray(
            denormalize_image(jnp.asarray(x_nhwc, dtype=jnp.float32))), 0, 1)

    rows = []
    real_randn_like = torch.randn_like
    for idx, batch in enumerate(loader):
        low = np.asarray(batch["low_light"], dtype=np.float32)   # NHWC
        high = np.asarray(batch["normal_light"], dtype=np.float32)
        rng = np.random.default_rng(args.seed * 10_000 + idx)
        init_noise = rng.normal(
            size=(1, 3, size, size)).astype(np.float32)          # NCHW
        step_noise = rng.normal(
            size=(steps, 1, 3, size, size)).astype(np.float32)

        # torch reference enhance loop with injected noise
        noise_iter = iter(list(step_noise))
        torch.randn_like = lambda t, **k: torch.tensor(next(noise_iter))
        try:
            latents = torch.tensor(init_noise)
            low_t = torch.tensor(np.transpose(low, (0, 3, 1, 2)))
            with torch.no_grad():
                for t in timesteps:
                    model_input = torch.cat([latents, low_t], dim=1)
                    t_vec = torch.full((1,), t, dtype=torch.long)
                    eps = tmodel(model_input, t_vec)
                    latents = scheduler.step(eps, t, latents).prev_sample
            ref_out = np.transpose(latents.clamp(-1, 1).numpy(),
                                   (0, 2, 3, 1))
        finally:
            torch.randn_like = real_randn_like

        # our scanned sampler, same noise
        to_nhwc = lambda a: jnp.asarray(np.transpose(a, (0, 2, 3, 1)))
        ours = np.asarray(enh(
            {"unet": unet_params}, jnp.asarray(low), to_nhwc(init_noise),
            jnp.stack([to_nhwc(n) for n in step_noise])))

        p_ours = float(psnr(jnp.asarray(to01(ours)), jnp.asarray(to01(high))))
        p_ref = float(psnr(jnp.asarray(to01(ref_out)),
                           jnp.asarray(to01(high))))
        s_ours = float(ssim(jnp.asarray(to01(ours)), jnp.asarray(to01(high))))
        s_ref = float(ssim(jnp.asarray(to01(ref_out)),
                           jnp.asarray(to01(high))))
        out_mad = float(np.abs(ours - ref_out).max())
        rows.append((batch["filenames"][0], p_ours, p_ref, s_ours, s_ref,
                     out_mad))
        print(f"{rows[-1][0]}: PSNR ours {p_ours:.3f} / ref {p_ref:.3f} dB "
              f"(Δ {p_ours - p_ref:+.4f})  SSIM {s_ours:.4f}/{s_ref:.4f}  "
              f"max|out_ours − out_ref| {out_mad:.2e}", flush=True)

    p_o = np.array([r[1] for r in rows])
    p_r = np.array([r[2] for r in rows])
    s_o = np.array([r[3] for r in rows])
    s_r = np.array([r[4] for r in rows])
    mad = np.array([r[5] for r in rows])
    delta = float(np.abs(p_o.mean() - p_r.mean()))
    print(f"\n{len(rows)} images @ {size}px, {steps}-step sampler, "
          f"identical injected noise")
    print(f"PSNR  ours {p_o.mean():.3f} ± {p_o.std():.3f} dB | "
          f"reference {p_r.mean():.3f} ± {p_r.std():.3f} dB | "
          f"mean PSNR delta {delta:.4f} dB | "
          f"max per-image |Δ| {np.abs(p_o - p_r).max():.4f} dB")
    print(f"SSIM  ours {s_o.mean():.4f} | reference {s_r.mean():.4f} | "
          f"delta {abs(s_o.mean() - s_r.mean()):.5f}")
    print(f"max |output difference| across all images: {mad.max():.2e} "
          f"(on the [-1,1] scale)")
    print(f"GATE (≤0.1 dB): {'PASS' if delta <= 0.1 else 'FAIL'}")


if __name__ == "__main__":
    main()
