"""Multi-chip data-parallel serving.

The reference serves on one device; here a DP mesh serves batches with the
sampler jitted once over ``data`` (params replicated, batch sharded): XLA
keeps every chip's sampler independent — zero collectives in the sampling
graph, so scaling is linear in chips (the mesh exists for deployment
topology, not communication).
"""

from __future__ import annotations

from typing import Callable

import jax

from ..models.diffusion import LowLightDiffusion
from ..models.scheduler import LCMSchedule
from .mesh import batch_sharding, make_mesh, replicated_sharding


def make_sharded_sample_fn(model: LowLightDiffusion, schedule: LCMSchedule,
                           num_inference_steps: int = 4,
                           mesh=None) -> Callable:
    """(params_or_variables, rng_key_data, low_light[B,H,W,3]) → enhanced,
    DP-sharded.

    ``B`` must be divisible by the mesh's data axis. Params are replicated
    onto every chip once at first call; batches shard over chips. Accepts
    the same inputs as the single-device sampler — a bare params tree or a
    full variables dict (e.g. int8_act packages with ``act_scales``).
    """
    from ..export.serving import make_sample_fn

    if mesh is None:
        mesh = make_mesh()
    repl = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)

    # One sampler body for every serving surface (single-device and
    # sharded) — only the jit sharding annotations differ.
    fn = make_sample_fn(model, schedule, num_inference_steps)

    from ..utils.compile_opts import tpu_compiler_options
    return jax.jit(fn, in_shardings=(repl, None, bsh), out_shardings=bsh,
                   compiler_options=tpu_compiler_options())
