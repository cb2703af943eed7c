"""Train state + jitted train/eval steps.

TPU-native equivalent of the reference ``LowLightTrainer`` inner loop
(``src/training/trainer.py:269-338``): one jitted, donated, mesh-sharded step
containing forward, backward, clip, AdamW update, LR schedule, and EMA — the
reference's per-step Python work (``loss.item()`` sync, ``scheduler.step()``,
EMA loop over tensors) all compiles into the same XLA program.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from ..config import TrainConfig
from ..models.diffusion import LowLightDiffusion, diffusion_loss, train_forward
from ..models.scheduler import LCMSchedule
from .ema import init_ema, update_ema


class TrainState(struct.PyTreeNode):
    """Everything that evolves during training, as one pytree.

    Replaces the reference's trainer attributes + torch checkpoint dict
    (``src/training/trainer.py:186-192,415-434``).
    """

    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any]
    rng: jax.Array
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return new_params, new_opt_state


def make_lr_schedule(config: TrainConfig, steps_per_epoch: int
                     ) -> optax.Schedule:
    """LR schedule.

    * ``cosine``: cosine from lr → min_lr over (total − warmup) steps.  The
      reference computes warmup steps but never applies warmup
      (``trainer.py:159-168``); ``faithful_no_warmup=True`` reproduces that,
      the default prepends a linear warmup.
    * ``onecycle``: cosine one-cycle (torch OneCycleLR equivalent,
      ``trainer.py:170-175``).
    """
    total_steps = max(1, steps_per_epoch * config.epochs)
    # Clamp: short runs (epochs < warmup_epochs) must still decay — an
    # unclamped warmup longer than the run makes cosine never leave warmup
    # and gives onecycle pct_start > 1 (optax doesn't validate; the
    # schedule silently peaks at ~lr/25).
    warmup_steps = min(steps_per_epoch * config.warmup_epochs,
                       total_steps // 2)
    if config.scheduler_type == "cosine":
        decay_steps = max(1, total_steps - warmup_steps)
        cosine = optax.cosine_decay_schedule(
            init_value=config.learning_rate, decay_steps=decay_steps,
            alpha=config.min_lr / config.learning_rate)
        if config.faithful_no_warmup or warmup_steps == 0:
            return cosine
        warmup = optax.linear_schedule(0.0, config.learning_rate,
                                       warmup_steps)
        return optax.join_schedules([warmup, cosine], [warmup_steps])
    if config.scheduler_type == "onecycle":
        return optax.cosine_onecycle_schedule(
            transition_steps=total_steps, peak_value=config.learning_rate,
            pct_start=max(1, warmup_steps) / total_steps)
    raise ValueError(f"Unknown scheduler type: {config.scheduler_type}")


def make_optimizer(config: TrainConfig, steps_per_epoch: int
                   ) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    """clip-by-global-norm → AdamW, matching the reference step order
    (``trainer.py:152-156,292-302``)."""
    lr = make_lr_schedule(config, steps_per_epoch)
    tx = optax.chain(
        optax.clip_by_global_norm(config.gradient_clip),
        optax.adamw(lr, weight_decay=config.weight_decay),
    )
    return tx, lr


def create_train_state(model: LowLightDiffusion, config: TrainConfig,
                       rng: jax.Array, steps_per_epoch: int = 100,
                       variables=None, tx=None) -> TrainState:
    """``tx=None`` builds the optimizer from the config; pass the tx from
    ``make_optimizer`` to share one (optimizer, schedule) construction with
    the host loop (the Trainer logs the schedule's LR)."""
    init_rng, state_rng = jax.random.split(rng)
    if tx is None:
        tx, _ = make_optimizer(config, steps_per_epoch)

    # Everything under jit: on remotely-compiled backends, eager init would
    # issue one compile per op (CLAUDE.md: the eager trap).
    if variables is None:
        from ..models.diffusion import init_model

        @jax.jit
        def build(key):
            params = init_model(model, key)["params"]
            return (params, tx.init(params),
                    init_ema(params) if config.use_ema else None)

        params, opt_state, ema = build(init_rng)
    else:
        params = variables["params"]

        @jax.jit
        def build(params):
            return (tx.init(params),
                    init_ema(params) if config.use_ema else None)

        opt_state, ema = build(params)

    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=params,
        opt_state=opt_state,
        ema_params=ema,
        rng=state_rng,
        tx=tx,
    )


def make_train_step(model: LowLightDiffusion, schedule: LCMSchedule,
                    config: TrainConfig,
                    mesh: Optional[Mesh] = None,
                    donate: bool = True,
                    params_transform: Optional[Callable] = None) -> Callable:
    """Build the jitted train step.

    Under a mesh, params/state are replicated and the batch is sharded on the
    data (and optionally spatial) axes; XLA inserts the gradient all-reduce.

    ``params_transform``: optional pure fn applied to the params INSIDE the
    loss (gradients flow through it) — the QAT fake-quant hook
    (``export.qat.make_qat_train_step``); None = identity.

    ``config.grad_accum_steps > 1`` scans over micro-batches inside the same
    jitted/donated program (one optimizer update per logical batch); composes
    with remat and the mesh (each micro-batch stays data-sharded).
    """

    accum = max(1, getattr(config, "grad_accum_steps", 1))

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray]
                ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng, step_rng = jax.random.split(state.rng)

        def loss_fn(params, micro_rng, micro_batch):
            if params_transform is not None:
                params = params_transform(params)
            out = train_forward(model, schedule, {"params": params},
                                micro_rng, micro_batch["low_light"],
                                micro_batch["normal_light"], train=True)
            return diffusion_loss(out["noise_pred"], out["target"],
                                  config.loss_type)

        if accum == 1:
            loss, grads = jax.value_and_grad(loss_fn)(state.params, step_rng,
                                                      batch)
        else:
            # Gradient accumulation: lax.scan over micro-batches so HBM
            # holds one micro-batch of activations at a time; grads/loss
            # are averaged before the single optimizer update (equivalent
            # to one big-batch step up to the per-micro RNG streams).
            lead = jax.tree_util.tree_leaves(batch)[0].shape[0]
            if lead % accum:
                raise ValueError(
                    f"batch size {lead} not divisible by "
                    f"grad_accum_steps={accum}")
            micro = jax.tree_util.tree_map(
                lambda a: a.reshape(accum, lead // accum, *a.shape[1:]),
                batch)
            micro_rngs = jax.random.split(step_rng, accum)

            def body(carry, xs):
                loss_sum, grad_sum = carry
                mb_rng, mb = xs
                l, g = jax.value_and_grad(loss_fn)(state.params, mb_rng, mb)
                return (loss_sum + l,
                        jax.tree_util.tree_map(jnp.add, grad_sum, g)), None

            init = (jnp.zeros((), jnp.float32),
                    jax.tree_util.tree_map(jnp.zeros_like, state.params))
            (loss_sum, grad_sum), _ = jax.lax.scan(body, init,
                                                   (micro_rngs, micro))
            loss = loss_sum / accum
            grads = jax.tree_util.tree_map(lambda g: g / accum, grad_sum)
        new_params, new_opt_state = state.apply_gradients(grads)
        new_ema = state.ema_params
        if new_ema is not None:
            new_ema = update_ema(new_ema, new_params, config.ema_decay,
                                 step=state.step if config.ema_warmup
                                 else None)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt_state,
                                  ema_params=new_ema, rng=rng)
        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    # 64M scoped-VMEM fusion scratch: +2.9% on-chip on this step
    # (499.4 -> 485.6 ms, small@256 b32 — BENCHMARKS.md); None on CPU.
    from ..utils.compile_opts import tpu_compiler_options
    copts = tpu_compiler_options()
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else (),
                       compiler_options=copts)

    from ..parallel.mesh import batch_sharding, replicated_sharding
    repl = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(repl, {"low_light": bsh, "normal_light": bsh}),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
        compiler_options=copts,
    )


def make_eval_step(model: LowLightDiffusion, schedule: LCMSchedule,
                   config: TrainConfig,
                   mesh: Optional[Mesh] = None) -> Callable:
    """Validation loss on EMA (or raw) params — mesh-sharded like training.

    Faithful to the reference: validation loss is **mse** regardless of the
    training loss type (``src/training/trainer.py:356`` hardcodes it).

    Ragged final batches (no drop_last) are handled by padding on the host
    (``parallel.mesh.pad_batch``) and masking here: the returned callable
    takes an optional ``n_valid`` — per-example mse is averaged over the
    first ``n_valid`` rows only, so padded rows contribute nothing and every
    batch shares one static shape / one compiled, fully-sharded program.
    """

    def eval_fn(params, rng: jax.Array, batch: Dict[str, jnp.ndarray],
                n_valid: jnp.ndarray) -> jnp.ndarray:
        out = train_forward(model, schedule, {"params": params}, rng,
                            batch["low_light"], batch["normal_light"],
                            train=False)
        err = (out["noise_pred"].astype(jnp.float32)
               - out["target"].astype(jnp.float32))
        per_example = jnp.mean(err * err, axis=(1, 2, 3))
        mask = jnp.arange(per_example.shape[0]) < n_valid
        return jnp.sum(per_example * mask) / jnp.maximum(n_valid, 1)

    if mesh is None:
        jitted = jax.jit(eval_fn)
    else:
        from ..parallel.mesh import batch_sharding, replicated_sharding
        repl = replicated_sharding(mesh)
        jitted = jax.jit(
            eval_fn,
            in_shardings=(repl, repl, batch_sharding(mesh), repl),
            out_shardings=repl,
        )

    def call(params, rng, batch, n_valid: Optional[int] = None):
        if n_valid is None:
            n_valid = jax.tree_util.tree_leaves(batch)[0].shape[0]
        return jitted(params, rng, batch,
                      jnp.asarray(n_valid, jnp.float32))

    return call
