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

Like the reference's ``skip_layers`` (``quantization.py:58-61``), norm scales/
biases and embedding-like small tensors stay in float32 — quantizing GN
params saves nothing and hurts accuracy.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

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


def quantize_bf16(params):
    """Cast float params to bf16 (``FP16Quantizer`` equivalent)."""
    return jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16)
        if jnp.issubdtype(p.dtype, jnp.floating) else p, params)


def _quantize_tensor(p: jnp.ndarray, per_channel: bool
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8: q = round(p / s), s = absmax/127 (per output channel =
    last axis for HWIO conv kernels and (in, out) dense kernels)."""
    pf = p.astype(jnp.float32)
    if per_channel and p.ndim >= 2:
        axes = tuple(range(p.ndim - 1))
        absmax = jnp.max(jnp.abs(pf), axis=axes, keepdims=True)
    else:
        absmax = jnp.max(jnp.abs(pf))
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(pf / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_int8(params, config: QuantizationConfig = QuantizationConfig()
                  ) -> Dict[str, Any]:
    """Quantize a params pytree → {"values": pytree, "scales": pytree,
    "quantized": pytree of bool}."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    values, scales, mask = [], [], []
    for path, p in flat:
        name = _path_str(path).lower()
        skip = (not jnp.issubdtype(p.dtype, jnp.floating)
                or p.size < config.min_size
                or any(pat in name for pat in config.skip_patterns))
        if skip:
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
