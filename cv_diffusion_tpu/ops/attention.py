"""Attention ops over flattened spatial tokens.

Two attention forms, matching the reference's two modules:

* Linear attention, O(N): ``out = φ(Q)·(φ(K)ᵀV) / (φ(Q)·Σφ(K) + 1e-6)`` with
  ``φ = elu + 1`` (``src/models/efficient_unet.py:239-308``).  The two
  contractions map straight onto the MXU; a fused Pallas kernel lives in
  :mod:`cv_diffusion_tpu.ops.pallas_attention` and is selected with
  ``use_pallas``.
* Standard softmax attention, O(N²)
  (``src/models/efficient_unet.py:311-357``).

Token layout everywhere: ``[B, N, heads, dim]`` (NHWC-flattened; head axis
kept inboard so the contraction dims stay on the 128-lane axis).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def elu_plus_one(x: jnp.ndarray) -> jnp.ndarray:
    """φ feature map for linear attention (``efficient_unet.py:289-290``)."""
    return jax.nn.elu(x) + 1.0


def linear_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     eps: float = 1e-6, use_pallas: bool = False) -> jnp.ndarray:
    """O(N) linear attention.

    Args:
      q, k, v: [B, N, H, D] (pre-feature-map; φ is applied inside).
    Returns:
      [B, N, H, D].
    """
    if use_pallas:
        # Differentiable wrapper: Pallas forward kernel + analytic XLA
        # backward, so the same path serves training and inference.
        # Sharding caveat: pallas_call is opaque to the SPMD partitioner —
        # under a spatially-sharded (token-axis) mesh the q/k/v operands are
        # gathered per device rather than kept sharded, so for genuinely
        # token-sharded regimes (512²+ over the spatial axis) keep the XLA
        # path (partitioner inserts the one psum) or use
        # linear_attention_sharded below.
        from .pallas_attention import linear_attention_pallas_trainable
        return linear_attention_pallas_trainable(q, k, v, eps)
    return linear_attention_xla(q, k, v, eps=eps)


def linear_attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         eps: float = 1e-6) -> jnp.ndarray:
    """Reference-parity XLA path (two einsum contractions + normalizer).

    Matches ``src/models/efficient_unet.py:288-302`` numerically: φ(q), φ(k),
    kv = Σ_n φ(k)ᵀv (a per-head D×D accumulator), normalizer q·Σφ(k).

    Accumulations run in float32 regardless of input dtype.
    """
    in_dtype = q.dtype
    qf = elu_plus_one(q.astype(jnp.float32))
    kf = elu_plus_one(k.astype(jnp.float32))
    vf = v.astype(jnp.float32)

    # Σ_n φ(k): [B, H, D]
    k_sum = kf.sum(axis=1)
    # φ(K)ᵀ V: [B, H, D, D] — the shardable per-head accumulator (one psum
    # over the token axis suffices under spatial sharding; see parallel/).
    kv = jnp.einsum("bnhd,bnhe->bhde", kf, vf,
                    preferred_element_type=jnp.float32)
    # Numerator φ(Q)·(φ(K)ᵀV): [B, N, H, D]
    num = jnp.einsum("bnhd,bhde->bnhe", qf, kv,
                     preferred_element_type=jnp.float32)
    # Normalizer φ(Q)·Σφ(K): [B, N, H]
    den = jnp.einsum("bnhd,bhd->bnh", qf, k_sum,
                     preferred_element_type=jnp.float32)
    out = num / (den[..., None] + eps)
    return out.astype(in_dtype)


def standard_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       scale: float) -> jnp.ndarray:
    """O(N²) softmax attention (``src/models/efficient_unet.py:349-353``).

    Args:
      q, k, v: [B, N, H, D]; ``scale`` = D**-0.5.
    """
    in_dtype = q.dtype
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    logits = jnp.einsum("bnhd,bmhd->bhnm", qf, kf,
                        preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, vf,
                     preferred_element_type=jnp.float32)
    return out.astype(in_dtype)


def linear_attention_sharded(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                             mesh, axis: str = "spatial",
                             eps: float = 1e-6) -> jnp.ndarray:
    """Token-sharded linear attention over a mesh axis.

    The O(N) form needs only a single ``psum`` of the per-head [D, D] kv
    accumulator and the [D] k-sum — the linear-attention analogue of ring
    attention, nearly free over ICI (SURVEY §5).  Inputs are sharded on the
    token axis ([B, N, H, D] with N split over ``axis``); outputs keep that
    sharding.

    Use for genuinely multi-chip spatial resolutions (512²–1024² images where
    the flattened h·w token axis is sharded under pjit).
    """
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    def local(q, k, v):
        qf = elu_plus_one(q.astype(jnp.float32))
        kf = elu_plus_one(k.astype(jnp.float32))
        vf = v.astype(jnp.float32)
        k_sum = jax.lax.psum(kf.sum(axis=1), axis)
        kv = jax.lax.psum(
            jnp.einsum("bnhd,bnhe->bhde", kf, vf,
                       preferred_element_type=jnp.float32), axis)
        num = jnp.einsum("bnhd,bhde->bnhe", qf, kv,
                         preferred_element_type=jnp.float32)
        den = jnp.einsum("bnhd,bhd->bnh", qf, k_sum,
                         preferred_element_type=jnp.float32)
        return (num / (den[..., None] + eps)).astype(q.dtype)

    spec = P(None, axis, None, None)
    return shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec)(q, k, v)


def standard_attention_flash(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                             scale: float) -> jnp.ndarray:
    """Flash-attention path for the O(N²) softmax form.

    Routes through JAX's stock Pallas TPU flash-attention kernel (tiled
    online-softmax — O(N) memory instead of materializing the [N, N] score
    matrix), for large token counts where ``standard_attention`` would blow
    HBM.  Falls back to the plain implementation when N is too small to tile
    (the kernel wants N ≥ 128).

    Layout adapter: ours is [B, N, H, D]; the kernel takes [B, H, N, D].
    """
    n = q.shape[1]
    if n < 128:
        return standard_attention(q, k, v, scale)
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention)

    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    out = flash_attention(qt, kt, vt, causal=False, sm_scale=scale)
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)
