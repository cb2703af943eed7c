"""Exponential moving average of parameters — pytree-native.

Equivalent of the reference ``EMAModel`` (``src/training/trainer.py:86-118``),
but instead of a name-keyed shadow dict with in-place mutation, the EMA is an
immutable params pytree updated by one fused ``tree_map`` lerp inside the
jitted train step (the reference runs a Python loop of small device ops per
step, ``trainer.py:98-104``).

No apply/restore weight-swapping is needed: evaluation simply calls the pure
apply function with the EMA tree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_ema(params):
    """Shadow copy of params (``trainer.py:94-96``).

    A real copy, not an alias: the train step donates its input state, and
    aliased params/EMA buffers would be donated twice.  The optimization
    barrier keeps XLA from CSE-ing the copy away when this runs inside a
    jitted state-initialization (identical outputs would share one buffer).
    """
    copied = jax.tree_util.tree_map(lambda p: jnp.array(p, copy=True), params)
    return jax.lax.optimization_barrier(copied)


def update_ema(ema_params, params, decay: float, step=None):
    """shadow ← shadow·d + p·(1−d) (``trainer.py:98-104``).

    With ``step`` (a traced scalar), the decay is warmed up as
    ``min(decay, (1+t)/(10+t))`` — the standard EMA warmup that makes the
    shadow usable in short runs (a fixed 0.9999 leaves it ~63% initialization
    after 5k steps).  ``step=None`` reproduces the reference's fixed decay.
    """
    d = jnp.asarray(decay, dtype=jnp.float32)
    if step is not None:
        t = step.astype(jnp.float32)
        d = jnp.minimum(d, (1.0 + t) / (10.0 + t))
    return jax.tree_util.tree_map(
        lambda e, p: (e * d + p.astype(e.dtype) * (1.0 - d)).astype(e.dtype),
        ema_params, params)
