"""LCM consistency training / distillation.

TPU-native equivalents of two reference components, both *wired into actual
training* here (the reference leaves them standalone — SURVEY §2):

* :class:`ConsistencyDistillation` — teacher→student consistency distillation
  (``src/models/low_light_diffusion.py:284-408``): frozen teacher takes a
  deterministic DDIM step t → t_next; the student's x̂₀ at t must match the
  EMA-student's x̂₀ at t_next (Huber loss).

  Behavioral note kept from the reference (and documented as a deviation from
  the canonical LCM formulation): the timestep index *grows* (t_next > t), so
  the EMA target is evaluated at the more-noised point
  (``low_light_diffusion.py:350-351``).

* :func:`consistency_loss` / :func:`huber_loss` — the ``LCMTrainer`` loss
  utilities (``src/models/lcm_scheduler.py:396-418``).

Everything is a pure function suitable for jit/pjit; the distillation step
factory returns a donated, mesh-shardable train step like the base trainer's.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.diffusion import LowLightDiffusion, enhance
from ..models.scheduler import (LCMSchedule, add_noise,
                                pred_original_sample, step as sampler_step)
from ..training.ema import update_ema


def consistency_loss(model_output: jnp.ndarray,
                     target_output: jnp.ndarray) -> jnp.ndarray:
    """MSE consistency loss (``lcm_scheduler.py:396-406``)."""
    return jnp.mean((model_output.astype(jnp.float32) -
                     target_output.astype(jnp.float32)) ** 2)


def huber_loss(model_output: jnp.ndarray, target_output: jnp.ndarray,
               delta: float = 1.0) -> jnp.ndarray:
    """Huber loss, LCM-paper recommended (``lcm_scheduler.py:408-418``).
    Delegates to the single implementation in ``diffusion.huber``."""
    from .diffusion import huber

    return huber(model_output, target_output, delta)


def sample_timestep_pairs(rng: jax.Array, batch_size: int,
                          num_train_timesteps: int, num_ddim_timesteps: int,
                          num_inference_steps: int
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(t, t_next) = (idx·c+c−1, (idx+k)·c+c−1), idx ~ U[0, N−k−1)
    (``low_light_diffusion.py:344-351``).

    Deviation from the reference's U[0, N−k) upper bound: the terminal grid
    point t=999 is excluded, because under the zero-terminal-SNR schedule
    (``rescale_betas_zero_snr``, the serving default) ᾱ₉₉₉ = 0 exactly and
    the x̂₀ = (x_t − √(1−ᾱ)ε)/√ᾱ parameterization is singular there — the
    loss NaNs on the first step (measured on-chip).  The reference ships
    this code unwired, so it could never observe its own divide-by-zero.

    Delegates to ``scheduler.consistency_timestep_pairs`` (one
    implementation, two historical signatures)."""
    from .scheduler import consistency_timestep_pairs

    return consistency_timestep_pairs(
        rng, batch_size, num_inference_steps,
        num_train_timesteps=num_train_timesteps,
        num_ddim_timesteps=num_ddim_timesteps)


def sample_canonical_pairs(rng: jax.Array, batch_size: int,
                           num_train_timesteps: int, num_ddim_timesteps: int,
                           num_inference_steps: int,
                           stride: Optional[int] = None
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(t, t_prev) with t > t_prev on the DDIM grid — the canonical LCM
    pairing (Luo et al. 2023, alg. 1): the student is trained at the *more*
    noised point and the EMA target sits one teacher step closer to data,
    where its x̂₀ estimate is strictly better.  Contrast with
    :func:`sample_timestep_pairs`, the reference's inverted pairing
    (``low_light_diffusion.py:344-351``).

    ``stride``: grid points the teacher's single DDIM step spans.  Default
    (None) follows the reference's skip k = N/num_inference_steps (12 of
    50 — a 240-t-unit jump whose ODE error pollutes the target); canonical
    consistency distillation uses ``stride=1`` (adjacent grid points, the
    self-consistency property then holds transitively along the whole
    trajectory)."""
    c = num_train_timesteps // num_ddim_timesteps
    k = num_ddim_timesteps // num_inference_steps if stride is None else stride
    # Exclude the terminal grid point (ᾱ = 0 under zero-terminal-SNR → x̂₀
    # singular); see sample_timestep_pairs.
    idx = jax.random.randint(rng, (batch_size,), k, num_ddim_timesteps - 1)
    t = idx * c + c - 1
    t_prev = (idx - k) * c + c - 1
    return t, t_prev


def _bcast(v: jnp.ndarray, ndim: int) -> jnp.ndarray:
    return v.reshape((-1,) + (1,) * (ndim - 1))


def consistency_distillation_loss(
        model: LowLightDiffusion, schedule: LCMSchedule,
        teacher_params, student_params, ema_student_params,
        rng: jax.Array, low_light: jnp.ndarray, normal_light: jnp.ndarray,
        num_ddim_timesteps: int = 50, num_inference_steps: int = 4,
        canonical: bool = False, clip_x0: float = 1.5,
        pair_stride: Optional[int] = None,
        sampler_matched: bool = False
) -> jnp.ndarray:
    """One consistency-distillation loss evaluation
    (``low_light_diffusion.py:325-408``).

    teacher ε at (x_t, t) → deterministic DDIM step → x_{t_next};
    student x̂₀ at (x_t, t) vs stop-gradient EMA-student x̂₀ at
    (x_{t_next}, t_next); Huber between the two.

    ``canonical=False`` (default) keeps the reference's pairing, where
    t_next > t — the EMA target is evaluated at the MORE-noised point.
    ``canonical=True`` flips to the standard LCM direction (teacher DDIM
    step *toward data*, target at the less-noised point); same math
    otherwise, since DDIM's deterministic map is shared.

    ``clip_x0``: x̂₀ predictions are clipped to ±clip_x0 (data lives in
    [−1, 1]).  Near the top of the DDIM grid 1/√ᾱ amplifies ε-error into
    x̂₀ by up to ~100×; without the clip the consistency targets blow up
    and training diverges (measured on-chip: loss 0.46 → 19 in 8 epochs).
    The reference's unwired code has no clip — a stability addition.

    ``sampler_matched``: distill over the deployed sampler's OWN Markov
    chain instead of DDIM trajectories — (t, t_next) are adjacent points of
    the actual k-step inference grid (``lcm_timesteps``, e.g.
    [739, 499, 259, 19]) and the transition renoises x̂₀ with FRESH noise,
    exactly the LCM sampler's stochastic step.  DDIM-trajectory consistency
    optimizes a sampler that is never run; this optimizes the one that is.
    """
    from .scheduler import lcm_timesteps

    batch = low_light.shape[0]
    noise_rng, t_rng, renoise_rng, drop_rng = jax.random.split(rng, 4)
    noise = jax.random.normal(noise_rng, normal_light.shape,
                              dtype=normal_light.dtype)
    if sampler_matched:
        grid = jnp.asarray(lcm_timesteps(
            num_inference_steps, schedule.config.num_train_timesteps,
            num_ddim_timesteps), jnp.int32)          # descending
        i = jax.random.randint(t_rng, (batch,), 0, grid.shape[0] - 1)
        t = grid[i]
        t_next = grid[i + 1]                         # one sampler step down
    elif canonical:
        t, t_next = sample_canonical_pairs(
            t_rng, batch, schedule.config.num_train_timesteps,
            num_ddim_timesteps, num_inference_steps, stride=pair_stride)
    else:
        t, t_next = sample_timestep_pairs(
            t_rng, batch, schedule.config.num_train_timesteps,
            num_ddim_timesteps, num_inference_steps)

    x_t = add_noise(schedule, normal_light, noise, t)

    acp = schedule.alphas_cumprod.astype(jnp.float32)
    alpha_t = _bcast(acp[t], x_t.ndim)
    alpha_t_next = _bcast(acp[t_next], x_t.ndim)

    # Teacher DDIM step t → t_next (frozen; under stop_gradient by closure).
    def to_x0(x, eps_pred, alpha):
        x0 = (x - jnp.sqrt(1 - alpha) * eps_pred) / jnp.sqrt(alpha)
        if clip_x0 is not None:
            x0 = jnp.clip(x0, -clip_x0, clip_x0)
        return x0

    teacher_eps = model.apply({"params": teacher_params}, x_t, low_light, t,
                              train=False).astype(jnp.float32)
    x_tf = x_t.astype(jnp.float32)
    x0_teacher = to_x0(x_tf, teacher_eps, alpha_t)
    if sampler_matched:
        # the deployed LCM sampler's transition: renoise x̂₀ with fresh noise
        fresh = jax.random.normal(renoise_rng, x_tf.shape, jnp.float32)
        x_t_next = (jnp.sqrt(alpha_t_next) * x0_teacher +
                    jnp.sqrt(1 - alpha_t_next) * fresh)
    else:
        # deterministic DDIM map (same ε reused)
        x_t_next = (jnp.sqrt(alpha_t_next) * x0_teacher +
                    jnp.sqrt(1 - alpha_t_next) * teacher_eps)
    x_t_next = jax.lax.stop_gradient(x_t_next).astype(x_t.dtype)

    # Student prediction at (x_t, t); dropout RNG needed under train=True
    # (models with dropout > 0 crash without it, same as train_forward).
    student_eps = model.apply({"params": student_params}, x_t, low_light, t,
                              train=True,
                              rngs={"dropout": drop_rng}).astype(jnp.float32)
    student_x0 = to_x0(x_tf, student_eps, alpha_t)

    # EMA-student target at (x_{t_next}, t_next) — no gradients.
    target_eps = model.apply({"params": ema_student_params}, x_t_next,
                             low_light, t_next, train=False)
    target_eps = jax.lax.stop_gradient(target_eps).astype(jnp.float32)
    target_x0 = to_x0(x_t_next.astype(jnp.float32), target_eps, alpha_t_next)
    target_x0 = jax.lax.stop_gradient(target_x0)

    return huber_loss(student_x0, target_x0)


def sampler_regression_loss(
        model: LowLightDiffusion, schedule: LCMSchedule,
        teacher_params, student_params,
        rng: jax.Array, low_light: jnp.ndarray, normal_light: jnp.ndarray,
        teacher_steps: int = 4,
        student_timesteps: Sequence[int] = (739,),
        deterministic_teacher: bool = False,
        gt_weight: float = 0.0,
        full_grad: bool = False,
        teacher_model: Optional[LowLightDiffusion] = None) -> jnp.ndarray:
    """Sampler-to-sampler regression distillation.

    The consistency objective transfers quality between ADJACENT grid
    points, which cannot rescue the 1-step regime: the reference's 1-step
    grid is ``[19]`` (``lcm_scheduler.py:131-167``), where the sampler
    feeds pure noise into a near-zero-noise timestep and x̂₀ ≈ the noise
    itself (measured 8.9 dB under every teacher/student).  This objective
    instead regresses the student's ENTIRE m-step sampler output (its own
    high-t grid, e.g. ``[739]``) onto the frozen teacher's full k-step
    deployed-sampler output, end to end:

        L = huber( student_sampler_m(noise, low),
                   stopgrad(teacher_sampler_k(noise', low)) )

    Because the student trains in exactly its deployment regime (input IS
    pure N(0,1) treated as x_{t_start}), the train/inference distribution
    mismatch that breaks the stock 1-step grid does not exist here.  With a
    stochastic teacher the student learns the teacher-output posterior
    mean — the MSE/PSNR-optimal point estimate.

    ``gt_weight`` mixes in a ground-truth anchor (paired data is available
    in this task): L = (1-w)·L_teacher + w·huber(student, normal_light).

    ``teacher_model``: architecture for the teacher forward when it differs
    from the student's (capacity-asymmetric distillation, e.g. a base-variant
    student under a small-variant teacher).  The objective only couples the
    two through sampler OUTPUTS, so unlike adjacent-pair consistency it
    places no same-architecture constraint.  Default None = shared model.

    No reference analogue: its distillation components
    (``low_light_diffusion.py:284-408``) only implement adjacent-pair
    consistency, and its 1-step sampler is degenerate by construction.
    """
    t_rng, s_rng = jax.random.split(rng)
    teacher_out = enhance(teacher_model or model, schedule,
                          {"params": teacher_params},
                          t_rng, low_light,
                          num_inference_steps=teacher_steps,
                          deterministic=deterministic_teacher)
    teacher_out = jax.lax.stop_gradient(teacher_out.astype(jnp.float32))

    grid = [int(t) for t in student_timesteps]
    if len(grid) == 1 or full_grad:
        student_out = enhance(model, schedule, {"params": student_params},
                              s_rng, low_light,
                              timesteps=tuple(student_timesteps)
                              ).astype(jnp.float32)
    else:
        # Memory-bounded multi-step student (default for m > 1): run the
        # first m−1 sampler steps under stop_gradient and backprop only
        # through the final step.  XLA saves every step's activations when
        # differentiating through the full scan — measured 42.4 GiB at
        # b16 / 27.7 GiB even at b4 for a 2-step small@256 student vs the
        # 15.75 GiB chip; the prefix states are still exactly the student's
        # own deployment distribution, so the truncated gradient trains the
        # final-step map on-policy (the shared weights see gradients from
        # the step that produces the output).  ``full_grad=True`` restores
        # end-to-end backprop for backends with the memory to hold it.
        dtype = jnp.dtype(model.config.unet.dtype)
        b, h, w = low_light.shape[:3]
        low = low_light.astype(dtype)
        s_init, s_steps = jax.random.split(s_rng)
        x = jax.random.normal(s_init, (b, h, w, 3)).astype(dtype)
        keys = jax.random.split(s_steps, len(grid) - 1)
        for i, t in enumerate(grid[:-1]):
            t_vec = jnp.full((b,), t, jnp.int32)
            eps = model.apply({"params": student_params}, x, low, t_vec,
                              train=False)
            x, _ = sampler_step(schedule, eps, jnp.asarray(t, jnp.int32),
                                jnp.asarray(grid[i + 1], jnp.int32), x,
                                rng=keys[i])
            x = jax.lax.stop_gradient(x)
        t_vec = jnp.full((b,), grid[-1], jnp.int32)
        eps = model.apply({"params": student_params}, x, low, t_vec,
                          train=False)
        x0 = pred_original_sample(schedule, eps,
                                  jnp.asarray(grid[-1], jnp.int32), x)
        # final-step semantics of the deployed sampler: x̂₀, clipped
        student_out = jnp.clip(x0, -1.0, 1.0).astype(jnp.float32)

    loss = huber_loss(student_out, teacher_out)
    if gt_weight:
        gt = huber_loss(student_out, normal_light.astype(jnp.float32))
        loss = (1.0 - gt_weight) * loss + gt_weight * gt
    return loss


class DistillationState(struct.PyTreeNode):
    """Distillation train state: frozen teacher + student + EMA student."""

    step: jnp.ndarray
    teacher_params: Any
    student_params: Any
    ema_student_params: Any
    opt_state: Any
    rng: jax.Array
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def create_distillation_state(teacher_params, student_params,
                              tx: optax.GradientTransformation,
                              rng: jax.Array) -> DistillationState:
    """Student defaults to a copy of the teacher when not given separately
    (standard LCM distillation init)."""
    @jax.jit
    def build(student):
        copy = jax.tree_util.tree_map(lambda p: p + 0, student)  # real copy
        return copy, tx.init(student)

    ema_student, opt_state = build(student_params)
    return DistillationState(
        step=jnp.zeros((), jnp.int32),
        teacher_params=teacher_params,
        student_params=student_params,
        ema_student_params=ema_student,
        opt_state=opt_state,
        rng=rng,
        tx=tx,
    )


def _jit_distillation_step(build_loss_fn: Callable, ema_decay: float,
                           mesh, donate: bool) -> Callable:
    """Shared update/jit plumbing for the distillation step factories.

    ``build_loss_fn(state, step_rng, batch)`` returns the scalar loss
    function of the student params; the wrapper adds grad/optimizer/EMA
    updates and mesh sharding.
    """

    def step_fn(state: DistillationState, batch: Dict[str, jnp.ndarray]
                ) -> Tuple[DistillationState, Dict[str, jnp.ndarray]]:
        rng, step_rng = jax.random.split(state.rng)
        loss_fn = build_loss_fn(state, step_rng, batch)
        loss, grads = jax.value_and_grad(loss_fn)(state.student_params)
        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.student_params)
        new_student = optax.apply_updates(state.student_params, updates)
        new_ema = update_ema(state.ema_student_params, new_student, ema_decay)
        new_state = state.replace(step=state.step + 1,
                                  student_params=new_student,
                                  ema_student_params=new_ema,
                                  opt_state=new_opt, rng=rng)
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
    from ..parallel.mesh import batch_sharding, replicated_sharding
    repl = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(step_fn,
                   in_shardings=(repl, {"low_light": bsh,
                                        "normal_light": bsh}),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,) if donate else ())


def make_distillation_step(model: LowLightDiffusion, schedule: LCMSchedule,
                           ema_decay: float = 0.95,
                           num_ddim_timesteps: int = 50,
                           num_inference_steps: int = 4,
                           mesh=None, donate: bool = True,
                           canonical: bool = False,
                           clip_x0: float = 1.5,
                           pair_stride: Optional[int] = None,
                           sampler_matched: bool = False) -> Callable:
    """Jitted distillation train step.

    EMA decay default 0.95 follows the distillation components
    (``lcm_scheduler.py:323``, ``low_light_diffusion.py:317``), not the
    trainer's 0.9999.  ``canonical`` selects the standard LCM timestep
    direction instead of the reference's inverted pairing (see
    :func:`consistency_distillation_loss`).
    """

    def build_loss_fn(state, step_rng, batch):
        def loss_fn(student_params):
            return consistency_distillation_loss(
                model, schedule, state.teacher_params, student_params,
                state.ema_student_params, step_rng, batch["low_light"],
                batch["normal_light"], num_ddim_timesteps,
                num_inference_steps, canonical=canonical, clip_x0=clip_x0,
                pair_stride=pair_stride, sampler_matched=sampler_matched)
        return loss_fn

    return _jit_distillation_step(build_loss_fn, ema_decay, mesh, donate)


def make_regression_distillation_step(
        model: LowLightDiffusion, schedule: LCMSchedule,
        ema_decay: float = 0.95,
        teacher_steps: int = 4,
        student_timesteps: Sequence[int] = (739,),
        deterministic_teacher: bool = False,
        gt_weight: float = 0.0,
        full_grad: bool = False,
        teacher_model: Optional[LowLightDiffusion] = None,
        mesh=None, donate: bool = True) -> Callable:
    """Jitted sampler-regression distillation step
    (:func:`sampler_regression_loss`) — the 1-step-student training mode.

    For m = ``len(student_timesteps)`` = 1 the student differentiates
    through its full sampler; for m > 1 the default backpropagates only
    through the FINAL step (stop-grad prefix — see
    :func:`sampler_regression_loss` for the measured HBM numbers that force
    this) unless ``full_grad=True``.  The teacher's k-step sampler always
    runs forward-only under ``stop_gradient``.
    """
    grid = tuple(int(t) for t in student_timesteps)

    def build_loss_fn(state, step_rng, batch):
        def loss_fn(student_params):
            return sampler_regression_loss(
                model, schedule, state.teacher_params, student_params,
                step_rng, batch["low_light"], batch["normal_light"],
                teacher_steps=teacher_steps, student_timesteps=grid,
                deterministic_teacher=deterministic_teacher,
                gt_weight=gt_weight, full_grad=full_grad,
                teacher_model=teacher_model)
        return loss_fn

    return _jit_distillation_step(build_loss_fn, ema_decay, mesh, donate)
