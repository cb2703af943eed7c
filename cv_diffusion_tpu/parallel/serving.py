"""Multi-chip data-parallel serving.

The reference serves on one device; here a DP mesh serves batches with the
sampler jitted once over ``data`` (params replicated, batch sharded): XLA
keeps every chip's sampler independent — zero collectives in the sampling
graph, so scaling is linear in chips (the mesh exists for deployment
topology, not communication).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..models.diffusion import LowLightDiffusion, enhance
from ..models.scheduler import LCMSchedule
from .mesh import batch_sharding, make_mesh, replicated_sharding


def make_sharded_sample_fn(model: LowLightDiffusion, schedule: LCMSchedule,
                           num_inference_steps: int = 4,
                           mesh=None) -> Callable:
    """(params, rng_key_data, low_light[B,H,W,3]) → enhanced, DP-sharded.

    ``B`` must be divisible by the mesh's data axis. Params are replicated
    onto every chip once at first call; batches shard over chips.
    """
    if mesh is None:
        mesh = make_mesh()
    repl = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)

    def fn(params, key_data, low_light):
        rng = jax.random.wrap_key_data(key_data)
        out = enhance(model, schedule, {"params": params}, rng, low_light,
                      num_inference_steps=num_inference_steps)
        return out.astype(jnp.float32)

    from ..utils.compile_opts import tpu_compiler_options
    return jax.jit(fn, in_shardings=(repl, None, bsh), out_shardings=bsh,
                   compiler_options=tpu_compiler_options())
