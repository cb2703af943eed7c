"""Device meshes and sharding rules.

The reference is strictly single-device (``src/training/trainer.py:142``); the
TPU framework makes multi-chip first-class via ``jax.sharding.Mesh`` + jit
sharding annotations, letting XLA insert the collectives (gradient ``psum``
for data parallel, halo exchanges for spatially sharded convs, one per-head
accumulator ``psum`` for token-sharded linear attention).

Axes:
  * ``data``    — batch axis (pure DP; the baseline for this model family).
  * ``spatial`` — image-height axis (sequence/spatial parallelism for large
    images; XLA SPMD inserts conv halo exchanges automatically).

Meshes ride ICI within a slice; reshape the device list so DCN-adjacent
devices land on the outer (data) axis when running multi-slice.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Tuple[str, ...] = (DATA_AXIS, SPATIAL_AXIS),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a mesh; default = all local devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard [B, H, W, C] batches over (data, spatial)."""
    axes = mesh.axis_names
    if SPATIAL_AXIS in axes and mesh.shape[SPATIAL_AXIS] > 1:
        return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch pytree with batch sharding.

    Arrays whose batch dim doesn't divide the data axis (e.g. a short final
    eval batch) are replicated instead — correctness over speed for stragglers.
    """
    sharding = batch_sharding(mesh)
    repl = replicated_sharding(mesh)

    def put(x):
        n = mesh.shape[DATA_AXIS]
        if x.ndim >= 1 and x.shape[0] % max(1, n) == 0:
            return jax.device_put(x, sharding)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(put, batch)


def auto_mesh(batch_size: int) -> Optional[Mesh]:
    """Largest data-parallel mesh compatible with ``batch_size``; ``None``
    when only one device (or nothing divides)."""
    import math

    n = len(jax.devices())
    d = math.gcd(n, batch_size)
    if d <= 1:
        return None
    return make_mesh((d, 1), devices=jax.devices()[:d])
