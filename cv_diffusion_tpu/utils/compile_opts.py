"""TPU compiler-option defaults for forward/serving graphs.

The axon remote-compile service forwards and validates per-compile XLA
options (``jax.jit(..., compiler_options=...)``), which is the only way to
reach TPU-backend flags from this client (client-side ``XLA_FLAGS`` dies in
the local CPU XLA's flag parser).

Measured on-chip (small@256 b128 4-step bf16 sampler, p50 of 10 iters):
raising the scoped-VMEM fusion-scratch budget above the 16 MiB default lets
XLA form larger fusions over the wide decoder hiddens —

    baseline 126.8 img/s | 48M 130.1 | 64M 129.2 | 96M 129.3  (+2-2.6%)

64 MiB is used (flat beyond 48M; matches the Pallas kernels'
``vmem_limit_bytes``). No reference equivalent — the reference has no
compiler-tuning surface at all.
"""

import os

import jax

# String-valued, per XLA's compile-options env schema.
TPU_COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": "65536"}


def maybe_enable_compilation_cache() -> bool:
    """Opt-in persistent XLA compilation cache for the CLIs.

    Set ``CVDM_COMPILE_CACHE=<dir>`` to cache compiled executables across
    process runs (big-graph compiles are minutes on the remote-compile TPU
    backend; repeated CLI invocations at the same shapes then start in
    seconds). Off by default: caching trades disk for compile time and is a
    per-user choice. Returns True when enabled. Call before the first jit.
    """
    cache_dir = os.environ.get("CVDM_COMPILE_CACHE", "")
    if not cache_dir:
        return False
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return True


def tpu_compiler_options():
    """Compiler options for ``jax.jit`` — TPU backends only.

    Returns None on CPU (the CPU compiler rejects TPU flags; tests and the
    virtual mesh run flag-free).
    """
    if jax.default_backend() == "cpu":
        return None
    return dict(TPU_COMPILER_OPTIONS)
