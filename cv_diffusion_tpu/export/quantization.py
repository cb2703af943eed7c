"""Weight quantization for serving: bf16 and int8.

TPU-native replacement of the reference quantization stack
(``src/export/quantization.py``): qnnpack/fbgemm eager-mode PTQ becomes

* **bf16** — cast the param pytree to bfloat16 (the TPU half precision;
  replaces ``FP16Quantizer``, ``quantization.py:122-141``);
* **int8** — symmetric per-channel weight quantization of conv/dense kernels
  (int8 values + float32 scales), dequantized to the compute dtype at load or
  kept quantized for int8-matmul serving.  Replaces
  ``INT8DynamicQuantizer``/``INT8StaticQuantizer``
  (``quantization.py:144-271``); activation calibration is unnecessary for
  weight-only quantization, which is what dominates memory/bandwidth for this
  model family.

Like the reference's ``skip_layers`` (``quantization.py:58-61``), the int8
path keeps norm scales/biases and embedding-like small tensors in float32 —
int8-quantizing GN params saves nothing and hurts accuracy.  bf16 casts
everything by default: norm params are upcast to f32 at compute time, and
keeping them f32 in storage measured 2% slower on-chip (broken epilogue
fusions); ``quantize_bf16(skip_norm_params=True)`` opts into the skip rules.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class QuantizationConfig:
    """Mirrors the reference ``QuantizationConfig``
    (``src/export/quantization.py:36-61``), TPU dtypes."""

    dtype: str = "bf16"  # bf16 | int8
    per_channel: bool = True
    # Parameters whose names contain any of these are kept float32.
    skip_patterns: Tuple[str, ...] = ("norm", "bias", "scale")
    # Minimum tensor size worth quantizing.
    min_size: int = 256


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def quantize_bf16(params, skip_norm_params: bool = False,
                  config: QuantizationConfig = QuantizationConfig()):
    """Cast float params to bf16 (``FP16Quantizer`` equivalent).

    Default: cast EVERYTHING.  Unlike int8 (where the skip rules protect
    GN params from real quantization damage), bf16 norm scales/biases are
    upcast to f32 at compute time anyway (``ops/norms.py``), so the only
    loss is 8-bit-mantissa storage rounding — and keeping them f32 was
    measured 2% SLOWER on-chip (126.8 vs 129.4 img/s headline: the f32
    leaves break bf16 conv-epilogue fusions).  ``skip_norm_params=True``
    applies the int8-style skip rules for cases where exact stored norm
    params matter more than throughput."""
    if not skip_norm_params:
        return jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if jnp.issubdtype(p.dtype, jnp.floating) else p, params)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = [p if should_skip_quant(path, p, config)
           else p.astype(jnp.bfloat16) for path, p in flat]
    return jax.tree_util.tree_unflatten(treedef, out)


def should_skip_quant(path, p,
                      config: QuantizationConfig = QuantizationConfig()
                      ) -> bool:
    """THE skip rule (norms/biases/small/non-float stay exact) — shared by
    PTQ int8, selective bf16, and QAT fake-quant so the three paths cannot
    silently disagree about which tensors quantize."""
    name = _path_str(path).lower()
    return (not jnp.issubdtype(p.dtype, jnp.floating)
            or p.size < config.min_size
            or any(pat in name for pat in config.skip_patterns))


def int8_scale(pf: jnp.ndarray, per_channel: bool) -> jnp.ndarray:
    """Symmetric int8 scale s = absmax/127 (per output channel = last axis
    for HWIO conv kernels and (in, out) dense kernels) — shared by PTQ and
    QAT so fake-quant simulates the export exactly."""
    if per_channel and pf.ndim >= 2:
        axes = tuple(range(pf.ndim - 1))
        absmax = jnp.max(jnp.abs(pf), axis=axes, keepdims=True)
    else:
        absmax = jnp.max(jnp.abs(pf))
    return jnp.maximum(absmax / 127.0, 1e-12)


def _quantize_tensor(p: jnp.ndarray, per_channel: bool
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8: q = round(p / s)."""
    pf = p.astype(jnp.float32)
    scale = int8_scale(pf, per_channel)
    q = jnp.clip(jnp.round(pf / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_int8(params, config: QuantizationConfig = QuantizationConfig()
                  ) -> Dict[str, Any]:
    """Quantize a params pytree → {"values": pytree, "scales": pytree,
    "quantized": pytree of bool}."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    values, scales, mask = [], [], []
    for path, p in flat:
        if should_skip_quant(path, p, config):
            values.append(p)
            scales.append(jnp.ones((), jnp.float32))
            mask.append(False)
        else:
            q, s = _quantize_tensor(p, config.per_channel)
            values.append(q)
            scales.append(s)
            mask.append(True)
    return {
        "values": jax.tree_util.tree_unflatten(treedef, values),
        "scales": jax.tree_util.tree_unflatten(treedef, scales),
        "quantized": jax.tree_util.tree_unflatten(treedef, mask),
    }


def dequantize_int8(quantized: Dict[str, Any], dtype=jnp.float32):
    """Reconstruct a float params pytree."""
    def deq(v, s, is_q):
        if is_q:
            return (v.astype(jnp.float32) * s).astype(dtype)
        return v
    return jax.tree_util.tree_map(deq, quantized["values"],
                                  quantized["scales"],
                                  quantized["quantized"])


def quantize_model(params, dtype: str = "bf16",
                   config: QuantizationConfig = None):
    """Dispatch like the reference ``quantize_model``
    (``quantization.py:314-352``). Returns (quantized_params, codec_tag)."""
    config = config or QuantizationConfig(dtype=dtype)
    if dtype in ("bf16", "bfloat16", "fp16"):
        return quantize_bf16(params), "bf16"
    if dtype in ("int8", "int8_dynamic"):
        return quantize_int8(params, config), "int8"
    if dtype in ("fp32", "float32", "none"):
        return params, "fp32"
    raise ValueError(f"Unknown quantization dtype: {dtype}")


def param_bytes(params) -> int:
    return sum(p.size * p.dtype.itemsize
               for p in jax.tree_util.tree_leaves(params))


def quantization_report(original, quantized) -> Dict[str, float]:
    """Size comparison (``benchmark_quantized_model`` size half,
    ``quantization.py:414-430``)."""
    if isinstance(quantized, dict) and "values" in quantized:
        q_bytes = (param_bytes(quantized["values"]) +
                   param_bytes(quantized["scales"]))
    else:
        q_bytes = param_bytes(quantized)
    o_bytes = param_bytes(original)
    return {
        "original_mb": o_bytes / 2 ** 20,
        "quantized_mb": q_bytes / 2 ** 20,
        "compression": o_bytes / max(1, q_bytes),
    }


def quantization_error(original, dequantized) -> float:
    """Max relative weight error across quantized tensors."""
    errs = []
    for o, d in zip(jax.tree_util.tree_leaves(original),
                    jax.tree_util.tree_leaves(dequantized)):
        if jnp.issubdtype(o.dtype, jnp.floating):
            of = np.asarray(o, dtype=np.float32)
            df = np.asarray(d, dtype=np.float32)
            denom = max(1e-8, float(np.abs(of).max()))
            errs.append(float(np.abs(of - df).max()) / denom)
    return max(errs) if errs else 0.0


# ---------------------------------------------------------------------------
# int8-activation compute path (true int8 execution — the TPU equivalent of
# the reference's qnnpack/fbgemm PTQ, ``src/export/quantization.py:144-271``)
# ---------------------------------------------------------------------------

def act_quant_model(config):
    """Return (model, schedule) with the int8 activation×weight compute path
    enabled (``ops/qconv.py``).  Params from the float model load directly —
    QConv is structurally identical to ``nn.Conv``."""
    import dataclasses

    from ..models.diffusion import LowLightDiffusion
    from ..models.scheduler import make_schedule

    unet_cfg = dataclasses.replace(config.unet, act_quant=True)
    cfg = dataclasses.replace(config, unet=unet_cfg)
    return LowLightDiffusion(cfg), make_schedule(cfg.scheduler)


def calibrate_act_scales(model, schedule, params, batches, rng=None,
                         max_batches: int = 100):
    """PTQ calibration: record per-module input absmax into the
    ``act_scales`` collection by running real conditioned forwards
    (noisy ⊕ low-light at sampled timesteps — the reference calibrates with
    a 3-channel input although the deployed model takes 6; SURVEY §2).

    ReLU6-bounded modules carry a static [0, 6] scale and skip calibration
    entirely (see ``ops/qconv.py``).

    Args:
      model: an ``act_quant=True`` model (see :func:`act_quant_model`).
      params: trained params tree (the "params" collection).
    Returns:
      the calibrated ``act_scales`` collection.
    """
    import jax

    from ..models.scheduler import add_noise

    rng = jax.random.key(0) if rng is None else rng

    @jax.jit
    def step(variables, rng, low, high):
        t_rng, n_rng = jax.random.split(rng)
        t = jax.random.randint(t_rng, (low.shape[0],), 0,
                               schedule.config.num_train_timesteps)
        noise = jax.random.normal(n_rng, high.shape, high.dtype)
        noisy = add_noise(schedule, high, noise, t)
        _, mutated = model.apply(variables, noisy, low, t, train=False,
                                 mutable=["act_scales"])
        return mutated["act_scales"]

    scales = None
    for i, batch in enumerate(batches):
        if i >= max_batches:
            break
        rng, b_rng = jax.random.split(rng)
        low = jnp.asarray(batch["low_light"])
        high = jnp.asarray(batch.get("normal_light", batch["low_light"]))
        variables = {"params": params}
        if scales is not None:
            variables["act_scales"] = scales
        scales = step(variables, b_rng, low, high)
    if scales is None:
        raise ValueError("calibrate_act_scales needs at least one batch")
    return scales


def assert_calibrated(act_scales) -> None:
    """Host-side check that every calibrated module saw data (amax > 0);
    an uncalibrated module would quantize with a degenerate scale."""
    flat = jax.tree_util.tree_flatten_with_path(act_scales)[0]
    bad = [_path_str(p) for p, v in flat if float(v) <= 0.0]
    if bad:
        raise ValueError(
            f"act_scales has uncalibrated entries (amax == 0): {bad}; "
            "run calibrate_act_scales over representative batches first")


# ---------------------------------------------------------------------------
# Static (activation) calibration + quantized-model benchmarking
# ---------------------------------------------------------------------------

def calibrate_activations(model, schedule, variables, batches,
                          rng=None, max_batches: int = 100):
    """Record per-module activation absmax scales over calibration batches.

    TPU equivalent of the reference's eager-mode static PTQ calibration pass
    (``INT8StaticQuantizer``, ``src/export/quantization.py:174-271``) — but
    calibrated with the *real* conditioned input (noisy ⊕ low-light at sampled
    timesteps); the reference calibrates with a 3-channel input although the
    deployed model takes 6 (SURVEY §2 notes the bug).

    Returns ``{module_path: absmax}`` suitable for an int8-activation serving
    path; stored in serving packages as ``activation_scales.json``.
    """
    import jax

    from ..models.scheduler import add_noise

    rng = jax.random.key(0) if rng is None else rng

    def captured(variables, noisy, low, t):
        _, state = model.apply(variables, noisy, low, t, train=False,
                               capture_intermediates=True,
                               mutable=["intermediates"])
        return state["intermediates"]

    # One jitted program per batch that reduces every intermediate to its
    # absmax ON DEVICE and a single running-max vector; host fetches once at
    # the end.  (The previous eager apply dispatched one remote compile per
    # op on the axon backend — CLAUDE.md's eager trap — plus one blocking
    # transfer per intermediate per batch.)
    names: Optional[list] = None
    running = None

    @jax.jit
    def absmax_step(variables, noisy, low, t, acc):
        flat = jax.tree_util.tree_flatten_with_path(
            captured(variables, noisy, low, t))[0]
        vals = jnp.stack([jnp.max(jnp.abs(v.astype(jnp.float32)))
                          for _, v in flat if hasattr(v, "dtype")])
        return jnp.maximum(acc, vals)

    for i, batch in enumerate(batches):
        if i >= max_batches:
            break
        rng, t_rng, n_rng = jax.random.split(rng, 3)
        low = jnp.asarray(batch["low_light"])
        high = jnp.asarray(batch.get("normal_light", batch["low_light"]))
        t = jax.random.randint(t_rng, (low.shape[0],), 0,
                               schedule.config.num_train_timesteps)
        noise = jax.random.normal(n_rng, high.shape, high.dtype)
        noisy = add_noise(schedule, high, noise, t)
        if names is None:
            shapes = jax.eval_shape(captured, variables, noisy, low, t)
            flat = jax.tree_util.tree_flatten_with_path(shapes)[0]
            names = [_path_str(p) for p, v in flat if hasattr(v, "dtype")]
            running = jnp.zeros((len(names),), jnp.float32)
        running = absmax_step(variables, noisy, low, t, running)
    if names is None:
        return {}
    host = np.asarray(jax.device_get(running))
    return {name: float(m) for name, m in zip(names, host)}


def benchmark_quantized_model(model, schedule, params,
                              dtypes=("fp32", "bf16", "int8"),
                              batch_size: int = 8, num_runs: int = 10,
                              num_inference_steps: int = 4):
    """Latency + size comparison across quantization modes.

    Equivalent of the reference ``benchmark_quantized_model``
    (``src/export/quantization.py:355-435``): per-mode mean latency, speedup
    vs fp32, and parameter-memory compression.
    """
    import jax

    from ..models.diffusion import enhance
    from ..utils.profiling import timeit

    size = model.config.image_size
    low = jax.jit(lambda k: jax.random.uniform(
        k, (batch_size, size, size, 3), minval=-1.0, maxval=-0.5))(
        jax.random.key(0))

    results = {}
    for dtype in dtypes:
        qparams, codec = quantize_model(params, dtype)
        # Weight-only int8 packages dequantize to float before compute —
        # the timing below measures that (dequantized-weights) run, NOT an
        # int8 compute path; see export.int8_serving for true int8 execution.
        run_params = (dequantize_int8(qparams) if codec == "int8"
                      else qparams)
        fn = jax.jit(lambda p, k, x: enhance(
            model, schedule, {"params": p}, k, x,
            num_inference_steps=num_inference_steps))
        stats = timeit(fn, run_params, jax.random.key(1), low,
                       warmup=2, iters=num_runs)
        rep = quantization_report(params, qparams)
        results[dtype] = {
            **stats,
            "size_mb": rep["quantized_mb"],
            "compression": rep["compression"],
            "compute_path": ("dequantized-weights"
                             if codec == "int8" else codec),
            "img_per_sec": batch_size / (stats["mean_ms"] / 1000),
        }
    # Speedups are anchored to the fp32 entry explicitly (not whichever
    # dtype happened to run first).
    base = results.get("fp32") or results.get("float32")
    if base is not None:
        for r in results.values():
            r["speedup_vs_fp32"] = base["mean_ms"] / r["mean_ms"]
    return results
