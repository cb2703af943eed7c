"""LCM (Latent Consistency Model) scheduler — functional, single source of truth.

The reference implements the LCM denoising math twice: a torch scheduler
(``src/models/lcm_scheduler.py:27-305``) and a NumPy re-implementation for the
deployed loop (``src/export/android_pipeline.py:191-277``).  Here there is
exactly one implementation: a pytree of precomputed tables
(:class:`LCMSchedule`) plus pure functions that compile into the training and
sampling graphs alike.

Numerics intentionally match the reference *code* (not its docstrings): the
4-step timestep grid is ``[739, 499, 259, 19]``
(``src/models/lcm_scheduler.py:131-167``; the docstring's ``[999, 749, 499,
249]`` claim at line 141 does not match the code).

Randomness is explicit: the renoise step takes a PRNG key, fixing the
reference's determinism hole where the ``generator`` argument is accepted but
ignored (``src/models/lcm_scheduler.py:236-237``).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import SchedulerConfig


@struct.dataclass
class LCMSchedule:
    """Precomputed noise-schedule tables (device arrays, float32).

    Equivalent of the state built in ``LCMScheduler.__init__``
    (``src/models/lcm_scheduler.py:76-104``).
    """

    betas: jnp.ndarray            # [T]
    alphas_cumprod: jnp.ndarray   # [T]  (ᾱ_t)
    final_alpha_cumprod: jnp.ndarray  # scalar: ᾱ_0
    # Static config rides along (not traced).
    config: SchedulerConfig = struct.field(pytree_node=False,
                                           default_factory=SchedulerConfig)

    @property
    def sigmas(self) -> jnp.ndarray:
        """σ_t = ((1-ᾱ_t)/ᾱ_t)^0.5 (``src/models/lcm_scheduler.py:97``)."""
        return ((1.0 - self.alphas_cumprod) / self.alphas_cumprod) ** 0.5


def _cosine_betas(timesteps: int, s: float = 0.008) -> np.ndarray:
    """squaredcos_cap_v2 schedule (``src/models/lcm_scheduler.py:107-114``)."""
    # float32 on purpose: torch.linspace/cos default to float32, and the
    # golden tests pin table values to the reference's numerics.
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float32)
    alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


def _rescale_zero_terminal_snr(alphas_cumprod: np.ndarray) -> np.ndarray:
    """Zero terminal SNR rescale (``src/models/lcm_scheduler.py:116-129``).

    Forces SNR(t=T)=0 so sampling starts from pure noise — the reference
    enables this for dark-image generation
    (``src/models/low_light_diffusion.py:102``).
    """
    alphas_bar_sqrt = np.sqrt(alphas_cumprod)
    a0 = alphas_bar_sqrt[0].copy()
    aT = alphas_bar_sqrt[-1].copy()
    alphas_bar_sqrt = alphas_bar_sqrt - aT
    alphas_bar_sqrt = alphas_bar_sqrt * (a0 / (a0 - aT))
    return alphas_bar_sqrt ** 2


def make_schedule(config: SchedulerConfig = SchedulerConfig()) -> LCMSchedule:
    """Build the schedule tables on host (NumPy, float64 → float32)."""
    T = config.num_train_timesteps
    if config.beta_schedule == "linear":
        betas = np.linspace(config.beta_start, config.beta_end, T,
                            dtype=np.float64)
    elif config.beta_schedule == "scaled_linear":
        # Stable-Diffusion-style sqrt-space schedule
        # (``src/models/lcm_scheduler.py:80-83``).
        betas = np.linspace(config.beta_start ** 0.5, config.beta_end ** 0.5,
                            T, dtype=np.float64) ** 2
    elif config.beta_schedule == "squaredcos_cap_v2":
        betas = _cosine_betas(T)
    else:
        raise ValueError(f"Unknown beta schedule: {config.beta_schedule}")

    alphas_cumprod = np.cumprod(1.0 - betas)
    if config.rescale_betas_zero_snr:
        alphas_cumprod = _rescale_zero_terminal_snr(alphas_cumprod)

    return LCMSchedule(
        betas=jnp.asarray(betas, dtype=jnp.float32),
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=jnp.float32),
        final_alpha_cumprod=jnp.asarray(alphas_cumprod[0], dtype=jnp.float32),
        config=config,
    )


def lcm_timesteps(num_inference_steps: int = 4,
                  num_train_timesteps: int = 1000,
                  original_inference_steps: int = 50) -> List[int]:
    """LCM inference timesteps, descending.

    Reproduces the reference *code* (``src/models/lcm_scheduler.py:131-167``
    and the duplicate at ``421-442``): with the defaults this yields
    ``[739, 499, 259, 19]`` for 4 steps and
    ``[859, 739, 619, 499, 379, 259, 139, 19]`` for 8.
    """
    if not 1 <= num_inference_steps <= original_inference_steps:
        raise ValueError(
            f"num_inference_steps={num_inference_steps} must be in "
            f"[1, original_inference_steps={original_inference_steps}]: the "
            "LCM grid subsamples the teacher's DDIM grid")
    c = num_train_timesteps // original_inference_steps
    origin = [i * c - 1 for i in range(1, original_inference_steps + 1)]
    skip = len(origin) // num_inference_steps
    steps = origin[::skip][:num_inference_steps]
    return list(reversed(steps))


def prev_timesteps(timesteps: Sequence[int]) -> List[int]:
    """For each timestep, the next (smaller) one in the grid, 0 after the last
    (``src/models/lcm_scheduler.py:169-174``)."""
    ts = list(timesteps)
    return ts[1:] + [0]


def add_noise(schedule: LCMSchedule, original_samples: jnp.ndarray,
              noise: jnp.ndarray, timesteps: jnp.ndarray) -> jnp.ndarray:
    """Forward process x_t = √ᾱ_t·x₀ + √(1-ᾱ_t)·ε
    (``src/models/lcm_scheduler.py:255-280``).

    ``timesteps``: int array [B]; samples are NHWC [B, H, W, C].
    """
    acp = schedule.alphas_cumprod.astype(original_samples.dtype)
    sqrt_alpha = jnp.sqrt(acp[timesteps])
    sqrt_one_minus = jnp.sqrt(1.0 - acp[timesteps])
    shape = (-1,) + (1,) * (original_samples.ndim - 1)
    sqrt_alpha = sqrt_alpha.reshape(shape)
    sqrt_one_minus = sqrt_one_minus.reshape(shape)
    return sqrt_alpha * original_samples + sqrt_one_minus * noise


def get_velocity(schedule: LCMSchedule, sample: jnp.ndarray,
                 noise: jnp.ndarray, timesteps: jnp.ndarray) -> jnp.ndarray:
    """v = √ᾱ_t·ε − √(1-ᾱ_t)·x₀ (``src/models/lcm_scheduler.py:282-305``)."""
    acp = schedule.alphas_cumprod.astype(sample.dtype)
    sqrt_alpha = jnp.sqrt(acp[timesteps])
    sqrt_one_minus = jnp.sqrt(1.0 - acp[timesteps])
    shape = (-1,) + (1,) * (sample.ndim - 1)
    sqrt_alpha = sqrt_alpha.reshape(shape)
    sqrt_one_minus = sqrt_one_minus.reshape(shape)
    return sqrt_alpha * noise - sqrt_one_minus * sample


def pred_original_sample(schedule: LCMSchedule, model_output: jnp.ndarray,
                         timestep: jnp.ndarray,
                         sample: jnp.ndarray) -> jnp.ndarray:
    """x̂₀ from the model output under the configured prediction type
    (``src/models/lcm_scheduler.py:214-225``)."""
    acp = schedule.alphas_cumprod.astype(sample.dtype)
    alpha_prod_t = acp[timestep]
    beta_prod_t = 1.0 - alpha_prod_t
    if schedule.config.prediction_type == "epsilon":
        x0 = (sample - jnp.sqrt(beta_prod_t) * model_output) / jnp.sqrt(alpha_prod_t)
    elif schedule.config.prediction_type == "v_prediction":
        x0 = jnp.sqrt(alpha_prod_t) * sample - jnp.sqrt(beta_prod_t) * model_output
    else:
        raise ValueError(
            f"Unknown prediction type: {schedule.config.prediction_type}")
    if schedule.config.clip_pred_x0:
        # Deployment-loop behavior (``src/export/android_pipeline.py:267``).
        x0 = jnp.clip(x0, -1.0, 1.0)
    return x0


def step(schedule: LCMSchedule, model_output: jnp.ndarray,
         timestep: jnp.ndarray, prev_timestep: jnp.ndarray,
         sample: jnp.ndarray,
         noise: Optional[jnp.ndarray] = None,
         rng: Optional[jax.Array] = None
         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One LCM denoising step (``src/models/lcm_scheduler.py:176-253``).

    Predict x̂₀, then — unless ``prev_timestep == 0`` — stochastically renoise
    to the previous grid point: x_prev = √ᾱ_prev·x̂₀ + √(1-ᾱ_prev)·ε.

    ``timestep``/``prev_timestep`` may be traced scalars so the whole 4-8 step
    loop compiles into a single scanned XLA graph.  Exactly one of ``noise``
    (an explicit tensor, for cross-framework parity harnesses) or ``rng`` must
    be provided when renoising can occur.

    Returns ``(prev_sample, pred_original_sample)``.
    """
    x0 = pred_original_sample(schedule, model_output, timestep, sample)

    acp = schedule.alphas_cumprod.astype(sample.dtype)
    # alpha_prod_prev: table value for prev_t > 0, ᾱ₀ otherwise
    # (``src/models/lcm_scheduler.py:209``; unused when prev_t == 0 because
    # that branch returns x̂₀ directly).
    alpha_prod_prev = jnp.where(
        prev_timestep > 0, acp[prev_timestep],
        schedule.final_alpha_cumprod.astype(sample.dtype))

    if noise is None:
        if rng is None:
            raise ValueError("step() needs `noise` or `rng` for the renoise branch")
        noise = jax.random.normal(rng, sample.shape, dtype=sample.dtype)

    renoised = (jnp.sqrt(alpha_prod_prev) * x0 +
                jnp.sqrt(1.0 - alpha_prod_prev) * noise)
    prev_sample = jnp.where(prev_timestep == 0, x0, renoised)
    return prev_sample, x0


def ddim_step(schedule: LCMSchedule, model_output: jnp.ndarray,
              timestep: jnp.ndarray, prev_timestep: jnp.ndarray,
              sample: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One *deterministic* (η=0 DDIM-style) denoising step.

    The reference's LCM step renoises x̂₀ with FRESH noise at every grid
    point (``src/models/lcm_scheduler.py:236-246``) — which is why its
    step-quality curve peaks at ~4 steps: extra steps inject extra noise
    that later steps must re-remove.  This variant transfers to the previous
    grid point along the model's own noise direction instead:

        ε̂     = (x_t − √ᾱ_t·x̂₀) / √(1−ᾱ_t)
        x_prev = √ᾱ_prev·x̂₀ + √(1−ᾱ_prev)·ε̂

    so quality improves monotonically with step count, giving a many-step
    teacher genuine headroom for distillation (the reference's distillation
    premise, ``src/models/low_light_diffusion.py:284-408``).  Deriving ε̂
    from x̂₀ (rather than reusing ``model_output``) keeps it correct for
    both prediction types AND consistent with ``clip_pred_x0``.

    Returns ``(prev_sample, pred_original_sample)``.
    """
    x0 = pred_original_sample(schedule, model_output, timestep, sample)

    acp = schedule.alphas_cumprod.astype(sample.dtype)
    alpha_prod_t = acp[timestep]
    # Under zero-terminal-SNR ᾱ can hit 0 at the top of the grid but never
    # 1, so √(1−ᾱ_t) is safe; clamp anyway for non-rescaled schedules where
    # ᾱ₀ → 1 would make the quotient explode at the final grid point.
    eps = (sample - jnp.sqrt(alpha_prod_t) * x0) / jnp.sqrt(
        jnp.maximum(1.0 - alpha_prod_t, 1e-8))
    alpha_prod_prev = jnp.where(
        prev_timestep > 0, acp[prev_timestep],
        schedule.final_alpha_cumprod.astype(sample.dtype))
    transferred = (jnp.sqrt(alpha_prod_prev) * x0 +
                   jnp.sqrt(1.0 - alpha_prod_prev) * eps)
    prev_sample = jnp.where(prev_timestep == 0, x0, transferred)
    return prev_sample, x0


def timestep_scan_arrays(num_inference_steps: int,
                         config: SchedulerConfig = SchedulerConfig()
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """(timesteps, prev_timesteps) as int32 arrays, ready to be `lax.scan` xs."""
    ts = lcm_timesteps(num_inference_steps, config.num_train_timesteps,
                       config.original_inference_steps)
    return (np.asarray(ts, dtype=np.int32),
            np.asarray(prev_timesteps(ts), dtype=np.int32))


def consistency_timestep_pairs(rng: jax.Array, batch_size: int,
                               num_inference_steps: int,
                               num_train_timesteps: int = 1000,
                               num_ddim_timesteps: int = 50
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample (t, t_next) pairs for consistency training.

    Equivalent of ``LCMTrainer.get_timestep_pairs``
    (``src/models/lcm_scheduler.py:367-394``): t = idx·c+c−1,
    t_next = (idx+k)·c+c−1 — but with idx ~ U[0, N−k−1), excluding the
    terminal grid point t_next=999: under the zero-terminal-SNR schedule
    ᾱ₉₉₉ = 0 exactly and any x̂₀ = (x_t − √(1−ᾱ)ε)/√ᾱ there is a NaN
    factory (the reference ships this code unwired and never observes its
    own divide-by-zero).  Single implementation shared with
    ``models.distillation.sample_timestep_pairs``.
    """
    c = num_train_timesteps // num_ddim_timesteps
    k = num_ddim_timesteps // num_inference_steps
    idx = jax.random.randint(rng, (batch_size,), 0,
                             num_ddim_timesteps - k - 1)
    t = idx * c + c - 1
    t_next = (idx + k) * c + c - 1
    return t, t_next
