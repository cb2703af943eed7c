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

from .quantization import QuantizationConfig, int8_scale, should_skip_quant


@jax.custom_vjp
def _ste_round(x):
    return jnp.round(x)


def _ste_fwd(x):
    return jnp.round(x), None


def _ste_bwd(_, g):
    return (g,)  # straight-through: d round(x)/dx ≈ 1


_ste_round.defvjp(_ste_fwd, _ste_bwd)


def fake_quant_tensor(p: jnp.ndarray, per_channel: bool = True) -> jnp.ndarray:
    """Simulate symmetric int8 quantize→dequantize with STE gradients.

    Scale comes from quantization.int8_scale — the same formula the PTQ
    export uses, so QAT simulates the deployed quantization exactly."""
    pf = p.astype(jnp.float32)
    scale = int8_scale(pf, per_channel)
    q = jnp.clip(_ste_round(pf / scale), -127, 127)
    return (q * scale).astype(p.dtype)


def fake_quant_params(params,
                      config: QuantizationConfig = QuantizationConfig()):
    """Apply fake quantization to every quantizable tensor in the pytree
    (``quantization.should_skip_quant`` rules: norms/biases/small tensors
    stay exact — identical to the post-training int8 export)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = [p if should_skip_quant(path, p, config)
           else fake_quant_tensor(p, config.per_channel) for path, p in flat]
    return jax.tree_util.tree_unflatten(treedef, out)


def make_qat_train_step(model, schedule, train_config, mesh=None,
                        donate: bool = True,
                        quant_config: Optional[QuantizationConfig] = None
                        ) -> Callable:
    """Train step whose forward pass sees int8-fake-quantized weights.

    Drop-in replacement for ``make_train_step`` — same state/batch
    signature.  Delegates to the production step builder via its
    ``params_transform`` hook, so EMA warmup, compiler options, sharding and
    donation semantics are guaranteed identical to non-QAT training (an
    earlier copy-pasted body had silently dropped EMA warmup and the
    scoped-VMEM option)."""
    from ..training.train_state import make_train_step

    qcfg = quant_config or QuantizationConfig()
    return make_train_step(model, schedule, train_config, mesh=mesh,
                           donate=donate,
                           params_transform=lambda p: fake_quant_params(
                               p, qcfg))
