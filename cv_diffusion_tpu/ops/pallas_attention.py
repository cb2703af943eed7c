"""Fused linear-attention Pallas TPU kernel.

Computes the reference's O(N) linear attention
(``src/models/efficient_unet.py:288-302``)::

    out = φ(Q)·(φ(K)ᵀV) / (φ(Q)·Σφ(K) + 1e-6),   φ = elu + 1

in a single kernel per batch element, instead of XLA's chain of
feature-map elementwise passes + einsums.

Layout trick: all heads are packed into the 128-wide lane axis
([N, H·D] with H·D == 128 for every variant: 4×32, 2×32 padded, …) and the
per-head structure is enforced with a block-diagonal mask on the tiny
[H·D, H·D] accumulator — the cross-head elements the matmul also produces are
masked away.  This keeps both big contractions ([N,128]@[128,128]) at full
MXU lane utilization; the 4× extra MXU work is free because the op is
bandwidth-bound.

Grid: ``(B, 2, N_tiles)`` — phase 0 accumulates ``kv = φ(K)ᵀV`` and
``k_sum = Σφ(K)`` into VMEM scratch over all N tiles; phase 1 streams Q tiles
and writes outputs.  Two reads of K/V+Q and one write — the minimum for this
dataflow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _elu_plus_one(x):
    # elu(x)+1 = exp(x) for x<0 else x+1; compute in f32.
    return jnp.where(x > 0, x + 1.0, jnp.exp(jnp.minimum(x, 0.0)))


def _kernel(q_ref, k_ref, v_ref, o_ref, kv_acc, ksum_acc, *, num_heads: int,
            head_dim: int, eps: float):
    phase = pl.program_id(2)
    tile = pl.program_id(3)
    d = num_heads * head_dim

    @pl.when(jnp.logical_and(phase == 0, tile == 0))
    def _init():
        kv_acc[:] = jnp.zeros_like(kv_acc)
        ksum_acc[:] = jnp.zeros_like(ksum_acc)

    @pl.when(phase == 0)
    def _accumulate():
        k = _elu_plus_one(k_ref[0].astype(jnp.float32))
        v = v_ref[0].astype(jnp.float32)
        # φ(K)ᵀ V : [D, D] — includes cross-head blocks, masked in phase 1.
        kv_acc[:] += jax.lax.dot_general(
            k, v, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ksum_acc[:] += jnp.sum(k, axis=0, keepdims=True)

    @pl.when(phase == 1)
    def _apply():
        q = _elu_plus_one(q_ref[0].astype(jnp.float32))
        # Block-diagonal head mask over the [D, D] accumulator.
        row = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0) // head_dim
        col = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1) // head_dim
        kv = jnp.where(row == col, kv_acc[:], 0.0)
        num = jnp.dot(q, kv, preferred_element_type=jnp.float32)
        # Per-head normalizer: q · Σφ(k) summed within each head's lanes.
        # Masked matmul with the block-diagonal pattern of ksum.
        ksum_diag = jnp.where(row == col,
                              jnp.broadcast_to(ksum_acc[:], (d, d)), 0.0)
        # den[n, h·D + j] = Σ_i q[n, h·D+i] · ksum[h·D+i]  (same for all j in
        # head h) — realized as q @ diag-blocked ksumᵀ.
        den = jnp.dot(q, ksum_diag.T, preferred_element_type=jnp.float32)
        o_ref[0] = (num / (den + eps)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "tile_n", "interpret"))
def linear_attention_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            eps: float = 1e-6, tile_n: int = 1024,
                            interpret: bool | None = None) -> jnp.ndarray:
    """Fused linear attention.

    Args:
      q, k, v: [B, N, H, D].  D ≤ 128; wider H·D is split over a head-group
        grid axis (e.g. base-variant 6×32 → two 96-lane groups).
    Returns:
      [B, N, H, D], same dtype as q.

    ``interpret``: None = auto (Pallas interpreter on CPU — tests / the
    virtual mesh — compiled Mosaic on TPU).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, n, h, dh = q.shape
    if dh > LANES:
        raise ValueError(f"head_dim={dh} > {LANES} lanes unsupported")
    # Head-group axis: pack as many whole heads as fit in the 128 lanes
    # (largest divisor of h, so every group is full). d ≤ 128 → one group,
    # the original layout; base-variant 6×32=192 → two groups of 3 heads.
    gsize = max(g for g in range(1, h + 1)
                if h % g == 0 and g * dh <= LANES)
    groups = h // gsize
    dg = gsize * dh
    # Mosaic wants block lane counts divisible by 128 (or the full array
    # width): with >1 group, pad each group to 128 lanes. The pad lanes form
    # *phantom heads* (φ(-30)≈0 K, zero V) that the kernel's block-diagonal
    # head mask keeps out of every real lane; they are sliced off at the end.
    d = dg if groups == 1 else LANES
    if groups > 1 and LANES % dh:
        raise ValueError(f"head_dim={dh} must divide {LANES} when heads "
                         f"span multiple lane groups")

    def pack(x, pad_value):
        xg = x.reshape(b, n, groups, dg)
        if d != dg:
            xg = jnp.pad(xg, ((0, 0), (0, 0), (0, 0), (0, d - dg)),
                         constant_values=pad_value)
        return xg.reshape(b, n, groups * d)

    qf = pack(q, 0.0)
    kf = pack(k, -30.0)
    vf = pack(v, 0.0)

    # Pad N to a tile multiple; padded K rows would pollute kv/ksum, so use
    # tile_n that divides or pad with zeros — φ(0) = 1 ≠ 0 pollutes k_sum!
    # Instead pad K with -30 (φ(-30) ≈ 9e-14 ≈ 0) and V with 0.
    tile = min(tile_n, n)
    rem = n % tile
    pad = (tile - rem) % tile
    if pad:
        qf = jnp.pad(qf, ((0, 0), (0, pad), (0, 0)))
        kf = jnp.pad(kf, ((0, 0), (0, pad), (0, 0)),
                     constant_values=-30.0)
        vf = jnp.pad(vf, ((0, 0), (0, pad), (0, 0)))
    n_pad = n + pad
    n_tiles = n_pad // tile

    grid = (b, groups, 2, n_tiles)

    def idx(bi, gi, phase, ti):
        return (bi, ti, gi)

    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=d // dh, head_dim=dh, eps=eps),
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, tile, d), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, d), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, d), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, d), idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, groups * d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((d, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
    )(qf, kf, vf)

    if pad:
        out = out[:, :n]
    out = out.reshape(b, n, groups, d)[..., :dg]
    return out.reshape(b, n, h, dh)


# -- Differentiable wrapper: Pallas forward, analytic XLA backward ----------
#
# The kernel above is forward-only (Mosaic emits no VJP).  For training we
# pair it with the closed-form gradient of the linear-attention math — the
# same fwd-kernel/analytic-bwd split JAX's stock flash-attention uses.  The
# backward runs as plain einsums (they are the transposes of the two forward
# contractions, equally MXU-friendly), recomputing φ(q)/φ(k)/kv/den from the
# saved inputs instead of storing O(N·D) intermediates.

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def linear_attention_pallas_trainable(q, k, v, eps: float = 1e-6):
    """``linear_attention_pallas`` with a VJP, usable under ``jax.grad``.

    q, k, v: [B, N, H, D]; returns [B, N, H, D] (same dtype as q).
    """
    return linear_attention_pallas(q, k, v, eps=eps)


# The backward is only valid if its feature map exactly matches the forward
# kernel's — alias, never redefine.
_phi = _elu_plus_one


def _phi_grad(x):
    # d/dx (elu(x)+1) = 1 for x>0 else exp(x).
    return jnp.where(x > 0, 1.0, jnp.exp(jnp.minimum(x, 0.0)))


def _trainable_fwd(q, k, v, eps):
    return linear_attention_pallas(q, k, v, eps=eps), (q, k, v)


def _trainable_bwd(eps, res, g):
    q, k, v = res
    qf = _phi(q.astype(jnp.float32))
    kf = _phi(k.astype(jnp.float32))
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)

    k_sum = kf.sum(axis=1)                                       # [B,H,D]
    kv = jnp.einsum("bnhd,bnhe->bhde", kf, vf,
                    preferred_element_type=jnp.float32)          # [B,H,D,E]
    den = jnp.einsum("bnhd,bhd->bnh", qf, k_sum,
                     preferred_element_type=jnp.float32) + eps   # [B,N,H]
    num = jnp.einsum("bnhd,bhde->bnhe", qf, kv,
                     preferred_element_type=jnp.float32)         # [B,N,H,E]

    d_num = gf / den[..., None]
    d_den = -jnp.einsum("bnhe,bnhe->bnh", gf, num,
                        preferred_element_type=jnp.float32) / (den * den)

    d_phiq = (jnp.einsum("bnhe,bhde->bnhd", d_num, kv,
                         preferred_element_type=jnp.float32)
              + d_den[..., None] * k_sum[:, None])
    d_kv = jnp.einsum("bnhd,bnhe->bhde", qf, d_num,
                      preferred_element_type=jnp.float32)
    d_ksum = jnp.einsum("bnhd,bnh->bhd", qf, d_den,
                        preferred_element_type=jnp.float32)
    d_phik = (jnp.einsum("bhde,bnhe->bnhd", d_kv, vf,
                         preferred_element_type=jnp.float32)
              + d_ksum[:, None])
    d_v = jnp.einsum("bnhd,bhde->bnhe", kf, d_kv,
                     preferred_element_type=jnp.float32)

    d_q = (d_phiq * _phi_grad(q.astype(jnp.float32))).astype(q.dtype)
    d_k = (d_phik * _phi_grad(k.astype(jnp.float32))).astype(k.dtype)
    return d_q, d_k, d_v.astype(v.dtype)


linear_attention_pallas_trainable.defvjp(_trainable_fwd, _trainable_bwd)
