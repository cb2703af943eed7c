"""Conditional diffusion model for low-light enhancement — the public API.

TPU-native equivalent of the reference ``LowLightDiffusion``
(``src/models/low_light_diffusion.py:31-281``): a UNet + LCM schedule pair
with

* a training forward pass (sample t, add noise, concat/add conditioning,
  predict ε) — ``forward``/``compute_loss``;
* ``enhance``: the 4-8 step LCM sampler compiled into a **single scanned XLA
  graph** (the reference drives a Python loop with one graph launch and a
  host sync per step, ``low_light_diffusion.py:216-237`` +
  ``lcm_scheduler.py:169-174``).

Everything is a pure function of (params, inputs, rng); randomness is explicit
PRNG keys (fixing the reference's ignored-generator hole,
``lcm_scheduler.py:236-237``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dataclasses import dataclass

from ..config import DiffusionConfig, diffusion_config
from . import scheduler as sched
from .scheduler import LCMSchedule, make_schedule
from .unet import EfficientUNet, memory_footprint


@dataclass
class EnhanceOutput:
    """Sampler output container (reference ``LowLightDiffusionOutput``,
    ``src/models/low_light_diffusion.py:24-28``)."""

    enhanced: jnp.ndarray
    intermediate: Optional[jnp.ndarray] = None


class ConditionEncoder(nn.Module):
    """Small conv encoder for "add" conditioning
    (``src/models/low_light_diffusion.py:108-113``)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv1")(x)
        h = jax.nn.silu(h)
        h = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv2")(h)
        return h


class LowLightDiffusion(nn.Module):
    """UNet + conditioning wrapper (one flax module so params live in one tree).

    Methods are exposed through ``apply(..., method=...)``; the convenience
    functions below wrap the common calls.
    """

    config: DiffusionConfig

    def setup(self):
        self.unet = EfficientUNet(self.config.unet, name="unet")
        if self.config.condition_mode == "add":
            self.condition_encoder = ConditionEncoder(
                dtype=jnp.dtype(self.config.unet.dtype),
                name="condition_encoder")

    def _model_input(self, latents: jnp.ndarray,
                     low_light: jnp.ndarray) -> jnp.ndarray:
        """Conditioning (``low_light_diffusion.py:156-160,221-225``)."""
        if self.config.condition_mode == "concat":
            return jnp.concatenate(
                [latents, low_light.astype(latents.dtype)], axis=-1)
        cond = self.condition_encoder(low_light)
        return latents + cond

    def __call__(self, latents: jnp.ndarray, low_light: jnp.ndarray,
                 timesteps: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """ε-prediction at given noisy latents / condition / timesteps."""
        model_input = self._model_input(latents, low_light)
        return self.unet(model_input, timesteps, train=train)


# ---------------------------------------------------------------------------
# Functional training / inference API
# ---------------------------------------------------------------------------

def create_model(config: Optional[DiffusionConfig] = None,
                 unet_variant: str = "small", image_size: int = 256,
                 num_inference_steps: int = 4,
                 condition_mode: str = "concat", **unet_overrides
                 ) -> Tuple[LowLightDiffusion, LCMSchedule]:
    """Build the model + schedule pair
    (equivalent of ``LowLightDiffusion.__init__``,
    ``src/models/low_light_diffusion.py:50-113``)."""
    if config is None:
        config = diffusion_config(unet_variant, image_size,
                                  num_inference_steps, condition_mode,
                                  **unet_overrides)
    return LowLightDiffusion(config), make_schedule(config.scheduler)


def init_model(model: LowLightDiffusion, rng: jax.Array,
               batch_size: int = 1):
    cfg = model.config
    s = cfg.image_size
    latents = jnp.zeros((batch_size, s, s, 3),
                        dtype=jnp.dtype(cfg.unet.dtype))
    cond = jnp.zeros((batch_size, s, s, 3), dtype=jnp.dtype(cfg.unet.dtype))
    t = jnp.zeros((batch_size,), dtype=jnp.int32)
    return model.init({"params": rng}, latents, cond, t)


def train_forward(model: LowLightDiffusion, schedule: LCMSchedule,
                  variables, rng: jax.Array, low_light: jnp.ndarray,
                  normal_light: jnp.ndarray,
                  timesteps: Optional[jnp.ndarray] = None,
                  noise: Optional[jnp.ndarray] = None,
                  train: bool = True) -> Dict[str, jnp.ndarray]:
    """Training forward pass (``low_light_diffusion.py:115-171``).

    Samples t ~ U[0, T), ε ~ N(0, 1), forms x_t, runs the UNet on the
    conditioned input.  Returns {noise_pred, noise, target, timesteps},
    where ``target`` is the regression target under the schedule's
    ``prediction_type``: ε for "epsilon", v = √ᾱ·ε − √(1-ᾱ)·x₀ for
    "v_prediction" (the reference defines ``get_velocity``,
    ``lcm_scheduler.py:282-305``, but its trainer only ever trains ε;
    here the config flag is honored end-to-end).
    """
    t_rng, n_rng, d_rng = jax.random.split(rng, 3)
    batch = low_light.shape[0]
    if timesteps is None:
        timesteps = jax.random.randint(
            t_rng, (batch,), 0, schedule.config.num_train_timesteps)
    if noise is None:
        noise = jax.random.normal(n_rng, normal_light.shape,
                                  dtype=normal_light.dtype)
    noisy = sched.add_noise(schedule, normal_light, noise, timesteps)
    noise_pred = model.apply(variables, noisy, low_light, timesteps,
                             train=train, rngs={"dropout": d_rng})
    if schedule.config.prediction_type == "v_prediction":
        target = sched.get_velocity(schedule, normal_light, noise, timesteps)
    else:
        target = noise
    return {"noise_pred": noise_pred, "noise": noise, "target": target,
            "timesteps": timesteps}


def huber(pred: jnp.ndarray, target: jnp.ndarray,
          delta: float = 1.0) -> jnp.ndarray:
    """torch ``F.huber_loss`` semantics; the single huber implementation
    (``diffusion_loss`` and ``distillation.huber_loss`` both use it)."""
    diff = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return jnp.mean(jnp.where(diff < delta, 0.5 * diff ** 2 / delta,
                              diff - 0.5 * delta) * delta)


def diffusion_loss(noise_pred: jnp.ndarray, noise: jnp.ndarray,
                   loss_type: str = "mse") -> jnp.ndarray:
    """mse / huber / l1 on ε (``low_light_diffusion.py:250-277``)."""
    pred = noise_pred.astype(jnp.float32)
    target = noise.astype(jnp.float32)
    if loss_type == "mse":
        return jnp.mean((pred - target) ** 2)
    if loss_type == "huber":
        return huber(pred, target)
    if loss_type == "l1":
        return jnp.mean(jnp.abs(pred - target))
    raise ValueError(f"Unknown loss type: {loss_type}")


def compute_loss(model: LowLightDiffusion, schedule: LCMSchedule, variables,
                 rng: jax.Array, low_light: jnp.ndarray,
                 normal_light: jnp.ndarray, loss_type: str = "mse",
                 train: bool = True) -> jnp.ndarray:
    out = train_forward(model, schedule, variables, rng, low_light,
                        normal_light, train=train)
    return diffusion_loss(out["noise_pred"], out["target"], loss_type)


def enhance(model: LowLightDiffusion, schedule: LCMSchedule, variables,
            rng: jax.Array, low_light: jnp.ndarray,
            num_inference_steps: Optional[int] = None,
            return_intermediate: bool = False,
            init_noise: Optional[jnp.ndarray] = None,
            step_noise: Optional[jnp.ndarray] = None,
            deterministic: bool = False,
            timesteps: Optional[Any] = None) -> jnp.ndarray:
    """LCM sampling as one ``lax.scan`` graph
    (``low_light_diffusion.py:177-248`` — minus the per-step host syncs).

    Args:
      rng: PRNG key; split into init-latent noise + one renoise key per step.
      low_light: [B, H, W, 3] condition in [-1, 1].
      init_noise / step_noise: optional explicit noise tensors
        ([B,H,W,3] and [steps,B,H,W,3]) for cross-framework parity harnesses.
      deterministic: renoise-free DDIM-style transitions
        (``scheduler.ddim_step``) — quality then improves monotonically with
        step count instead of peaking at ~4 steps, which is what gives a
        many-step teacher distillation headroom. Initial latents still come
        from ``rng``/``init_noise``; ``step_noise`` is unused.
      timesteps: explicit descending timestep grid overriding the
        reference-faithful ``lcm_timesteps`` grid.  The stock 1-step grid is
        ``[19]`` — the sampler starts from pure noise at a near-zero-noise
        grid point, so x̂₀ ≈ the noise itself and 1-step output is degenerate
        (measured 8.9 dB).  A sampler-regression-distilled 1-step student
        (``distillation.sampler_regression_loss``) instead uses a high-t
        start like ``[739]``, which must be passed here at inference too.

    Returns [B, H, W, 3] in [-1, 1], or an ``EnhanceOutput`` when
      ``return_intermediate=True``.
    """
    cfg = model.config
    steps = num_inference_steps or cfg.num_inference_steps
    # Latents are sized from the actual input, not cfg.image_size — the
    # reference sizes its latents from the input tensor too.
    batch, height, width = low_light.shape[:3]
    dtype = jnp.dtype(cfg.unet.dtype)

    if timesteps is not None:
        grid = [int(t) for t in timesteps]
        steps = len(grid)
        ts = np.asarray(grid, dtype=np.int32)
        prev_ts = np.asarray(sched.prev_timesteps(grid), dtype=np.int32)
    else:
        ts, prev_ts = sched.timestep_scan_arrays(steps, schedule.config)
    ts = jnp.asarray(ts)
    prev_ts = jnp.asarray(prev_ts)

    init_rng, steps_rng = jax.random.split(rng)
    if init_noise is None:
        init_noise = jax.random.normal(init_rng, (batch, height, width, 3))
    latents = init_noise.astype(dtype)
    if step_noise is None:
        step_keys = jax.random.split(steps_rng, steps)
        step_noise = jax.vmap(
            lambda k: jax.random.normal(k, (batch, height, width, 3)))(
            step_keys)
    step_noise = step_noise.astype(dtype)

    low = low_light.astype(dtype)

    def body(latents, xs):
        t, prev_t, noise = xs
        t_vec = jnp.full((batch,), t, dtype=jnp.int32)
        noise_pred = model.apply(variables, latents, low, t_vec, train=False)
        # Scheduler arithmetic in f32 regardless of the UNet compute dtype.
        # x̂₀ = (x_t − √(1−ᾱ_t)·ε̂)/√ᾱ_t amplifies ε̂ error by 1/√ᾱ_t (~7×
        # at t=739); running the reconstruction itself in f32 removes the
        # scheduler's own rounding from that path for free (elementwise VPU
        # ops XLA fuses; all MXU work stays bf16) and matches the torch
        # reference's f32 scheduler (``lcm_scheduler.py``). Measured effect
        # is small (teacher 22.41→22.40 dB, SSIM +0.0005 — within noise):
        # the dominant bf16 cost on high-t 1-step grids is the UNet's OWN
        # bf16 compute noise × 7, which no scheduler precision can remove
        # (BENCHMARKS.md round 4, "the bf16 1-step gap").
        if deterministic:
            prev_sample, _ = sched.ddim_step(
                schedule, noise_pred.astype(jnp.float32), t, prev_t,
                latents.astype(jnp.float32))
        else:
            prev_sample, _ = sched.step(
                schedule, noise_pred.astype(jnp.float32), t, prev_t,
                latents.astype(jnp.float32),
                noise=noise.astype(jnp.float32))
        # carry returns to the UNet dtype (it is the next step's input);
        # the final bf16 cast costs ~2^-8 quantization (≈60 dB floor),
        # negligible next to the in-step amplification fixed above
        prev_sample = prev_sample.astype(dtype)
        return prev_sample, prev_sample if return_intermediate else None

    latents, intermediates = jax.lax.scan(
        body, latents, (ts, prev_ts, step_noise), unroll=True)

    enhanced = jnp.clip(latents, -1.0, 1.0)
    if return_intermediate:
        return EnhanceOutput(enhanced=enhanced, intermediate=intermediates)
    return enhanced


def get_model_size(variables) -> Dict[str, float]:
    """Parameter/memory summary (``low_light_diffusion.py:279-281``)."""
    return memory_footprint(variables)


def normalize_image(image: jnp.ndarray) -> jnp.ndarray:
    """[0, 1] → [-1, 1] (``low_light_diffusion.py:412-414``)."""
    return image * 2.0 - 1.0


def denormalize_image(image: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] → [0, 1] (``low_light_diffusion.py:417-419``)."""
    return (image + 1.0) / 2.0
