"""Quantization-aware training (fake-quant with straight-through estimator).

The reference declares a ``QuantizationAwareTraining`` wrapper but never
invokes it (``src/export/quantization.py:274-311``).  Here QAT is a usable
training mode: :func:`fake_quant_params` simulates int8 weight quantization
inside the forward pass while gradients flow through unchanged (STE), so the
trained weights survive the post-training int8 export with minimal quality
loss.

Usage: wrap the loss's params with ``fake_quant_params`` inside the train
step, or build a step via :func:`make_qat_train_step`.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .quantization import QuantizationConfig, _path_str


@jax.custom_vjp
def _ste_round(x):
    return jnp.round(x)


def _ste_fwd(x):
    return jnp.round(x), None


def _ste_bwd(_, g):
    return (g,)  # straight-through: d round(x)/dx ≈ 1


_ste_round.defvjp(_ste_fwd, _ste_bwd)


def fake_quant_tensor(p: jnp.ndarray, per_channel: bool = True) -> jnp.ndarray:
    """Simulate symmetric int8 quantize→dequantize with STE gradients."""
    pf = p.astype(jnp.float32)
    if per_channel and p.ndim >= 2:
        axes = tuple(range(p.ndim - 1))
        absmax = jnp.max(jnp.abs(pf), axis=axes, keepdims=True)
    else:
        absmax = jnp.max(jnp.abs(pf))
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(_ste_round(pf / scale), -127, 127)
    return (q * scale).astype(p.dtype)


def fake_quant_params(params,
                      config: QuantizationConfig = QuantizationConfig()):
    """Apply fake quantization to every quantizable tensor in the pytree
    (same skip rules as post-training int8: norms/biases/small tensors stay
    exact)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, p in flat:
        name = _path_str(path).lower()
        skip = (not jnp.issubdtype(p.dtype, jnp.floating)
                or p.size < config.min_size
                or any(pat in name for pat in config.skip_patterns))
        out.append(p if skip else fake_quant_tensor(p, config.per_channel))
    return jax.tree_util.tree_unflatten(treedef, out)


def make_qat_train_step(model, schedule, train_config, mesh=None,
                        donate: bool = True,
                        quant_config: Optional[QuantizationConfig] = None
                        ) -> Callable:
    """Train step whose forward pass sees int8-fake-quantized weights.

    Drop-in replacement for ``make_train_step`` — same state/batch signature.
    """
    import optax

    from ..models.diffusion import diffusion_loss, train_forward
    from ..training.ema import update_ema

    qcfg = quant_config or QuantizationConfig()

    def step_fn(state, batch):
        rng, step_rng = jax.random.split(state.rng)

        def loss_fn(params):
            qparams = fake_quant_params(params, qcfg)
            out = train_forward(model, schedule, {"params": qparams},
                                step_rng, batch["low_light"],
                                batch["normal_light"], train=True)
            return diffusion_loss(out["noise_pred"], out["noise"],
                                  train_config.loss_type)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        new_params, new_opt_state = state.apply_gradients(grads)
        new_ema = state.ema_params
        if new_ema is not None:
            new_ema = update_ema(new_ema, new_params, train_config.ema_decay)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt_state, ema_params=new_ema,
                                  rng=rng)
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
