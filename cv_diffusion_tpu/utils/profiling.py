"""Profiling & timing utilities.

The reference has no profiling subsystem — only wall-clock micro-benchmarks
with warmup and cuda-synchronize (``scripts/benchmark.py:72-79``, SURVEY §5).
TPU-native equivalents:

* :func:`trace` — ``jax.profiler`` trace capture (open the result in
  Perfetto / TensorBoard's profile plugin);
* :func:`timeit` — warmed-up wall-clock timing with ``block_until_ready``
  (the TPU analogue of the reference's cuda-sync-aware timers);
* :func:`flops_estimate` — XLA's own cost analysis for a jitted function.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """Capture a device trace: ``with trace("/tmp/t"): f()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def timeit(fn: Callable, *args, warmup: int = 2, iters: int = 10,
           **kwargs) -> Dict[str, float]:
    """Wall-clock stats for a device function; synchronizes on the result."""
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    arr = np.asarray(times) * 1000
    return {
        "mean_ms": float(arr.mean()),
        "std_ms": float(arr.std()),
        "min_ms": float(arr.min()),
        "max_ms": float(arr.max()),
        "p50_ms": float(np.percentile(arr, 50)),
    }


def flops_estimate(fn: Callable, *args) -> Optional[Dict[str, float]]:
    """XLA cost analysis (flops / bytes accessed) for ``jit(fn)(*args)``.

    Returns None when the backend doesn't expose cost analysis.
    """
    try:
        # Keep an already-jitted fn as-is: re-wrapping in a fresh jax.jit
        # would drop its compiler_options (e.g. the shipped 64M scoped-VMEM
        # option) and analyze a different program than the one being timed.
        jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
        compiled = jitted.lower(*args).compile()
        cost = compiled.cost_analysis()
        if cost is None:
            return None
        if isinstance(cost, list):
            cost = cost[0]
        return {
            "flops": float(cost.get("flops", -1)),
            "bytes_accessed": float(cost.get("bytes accessed", -1)),
        }
    except Exception:
        return None


def device_memory_stats() -> Optional[Dict[str, float]]:
    """Live/peak HBM bytes for the first device, when the backend reports it."""
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return None
    return {k: float(v) for k, v in stats.items()
            if isinstance(v, (int, float))}
