"""Normalization ops (NHWC, float32 statistics).

Functional group norm used by every block (reference uses
``nn.GroupNorm(min(32, C), C)`` throughout, e.g.
``src/models/efficient_unet.py:170-171,263,528``).  Statistics are always
computed in float32 even when activations are bfloat16 — the TPU-correct way
to run mixed precision.

The reference's group-count rule ``min(32, C)`` is invalid whenever C is not
divisible by 32 (torch raises; the reference's own "tiny" and "base" variants
crash on construction because of the decoder's 48-channel concat).  We use the
largest group count ≤ min(32, C) that divides C, which is identical for every
configuration the reference can actually run.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gn_num_groups(channels: int, max_groups: int = 32) -> int:
    """Largest group count ≤ min(max_groups, channels) dividing channels."""
    g = min(max_groups, channels)
    while channels % g:
        g -= 1
    return g


def _group_stats(x: jnp.ndarray, num_groups: int, eps: float):
    """Per-(batch, group) inverse-stddev and mean, computed in float32 without
    materializing a float32 copy of ``x`` (the converts fuse into the
    reduction and the consuming elementwise loop — critical for bf16 HBM
    traffic: this model is bandwidth-bound).

    Returns (mean, rstd) with shape [..., num_groups, 1] broadcastable against
    x reshaped to groups.
    """
    c = x.shape[-1]
    xg = x.reshape(x.shape[:-1] + (num_groups, c // num_groups))
    axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    # E[x], E[x²] in one fused pass over the bf16 input.
    mean = jnp.mean(xg, axis=axes, keepdims=True, dtype=jnp.float32)
    mean2 = jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=axes,
                     keepdims=True, dtype=jnp.float32)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    return xg, mean, rstd


def group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               num_groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """Group normalization over an NHWC (or N...C) tensor.

    Matches ``torch.nn.GroupNorm`` semantics (eps 1e-5, per-group statistics
    over all spatial positions and the group's channels); statistics in
    float32, storage dtype unchanged.
    """
    orig_dtype = x.dtype
    c = x.shape[-1]
    assert c % num_groups == 0, (c, num_groups)
    xg, mean, rstd = _group_stats(x, num_groups, eps)
    xn = (xg.astype(jnp.float32) - mean) * rstd
    xf = xn.reshape(x.shape)
    out = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)


def concat_group_norm_parts(u: jnp.ndarray, s: jnp.ndarray,
                            scale: jnp.ndarray, bias: jnp.ndarray,
                            num_groups: int, eps: float = 1e-5
                            ) -> tuple:
    """GroupNorm of ``concat([u, s], -1)`` applied to each part WITHOUT
    materializing the concatenated tensor.

    The decoder's first block per level reads ``concat(upsampled, skip)``
    (reference ``efficient_unet.py:483-525``); at 256² that concat is the
    single largest tensor in the graph, and GN is the op that forces it to
    exist (its group statistics span the concat boundary, so groups cannot
    simply be split between the two inputs — e.g. small's 320-channel level
    has group size 10, straddling the 192/128 boundary).  Instead the
    statistics are assembled from per-channel partial sums of each part —
    sum is associative, so the result equals ``group_norm(concat(u, s))``
    up to reduction-order float noise — and the normalize stays elementwise
    per part, fusing into whatever consumes it (the split expand conv).

    Returns ``(û, ŝ)``: the two normalized+affine slices, original dtypes.
    """
    cu, cs = u.shape[-1], s.shape[-1]
    c = cu + cs
    assert c % num_groups == 0, (c, num_groups)
    gs = c // num_groups
    f32 = jnp.float32
    spatial = tuple(range(1, u.ndim - 1))
    n = float(np.prod([u.shape[a] for a in spatial]) * gs)
    # One fused pass over each part: E[x], E[x²] accumulated in f32.
    sums = jnp.concatenate(
        [jnp.sum(u, axis=spatial, dtype=f32),
         jnp.sum(s, axis=spatial, dtype=f32)], axis=-1)     # [B, C]
    sums2 = jnp.concatenate(
        [jnp.sum(jnp.square(u.astype(f32)), axis=spatial),
         jnp.sum(jnp.square(s.astype(f32)), axis=spatial)], axis=-1)
    gsum = sums.reshape(-1, num_groups, gs).sum(-1)          # [B, G]
    gsum2 = sums2.reshape(-1, num_groups, gs).sum(-1)
    mean = gsum / n
    var = jnp.maximum(gsum2 / n - jnp.square(mean), 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    # group → channel broadcast, then split back at the concat boundary
    mean_c = jnp.repeat(mean, gs, axis=-1)                   # [B, C]
    rstd_c = jnp.repeat(rstd, gs, axis=-1)

    def norm_part(x, lo, hi):
        bshape = (x.shape[0],) + (1,) * (x.ndim - 2) + (hi - lo,)
        m = mean_c[:, lo:hi].reshape(bshape)
        r = rstd_c[:, lo:hi].reshape(bshape)
        g = scale[lo:hi].astype(f32)
        b = bias[lo:hi].astype(f32)
        return ((x.astype(f32) - m) * r * g + b).astype(x.dtype)

    return norm_part(u, 0, cu), norm_part(s, cu, c)


def gn2_film_affine_gram(xhat: jnp.ndarray, wexp: jnp.ndarray,
                         scale: jnp.ndarray, bias: jnp.ndarray,
                         film_scale: jnp.ndarray, film_shift: jnp.ndarray,
                         num_groups: int, eps: float = 1e-5):
    """Fold GroupNorm(+FiLM) *of a 1×1-conv output* into a per-(batch,
    channel) affine, without materializing the conv output.

    For h1 = x̂ W (the IRB's 4×-expanded hidden,
    ``src/models/efficient_unet.py:205-217``), every per-channel moment of h1
    follows from the augmented Gram matrix of x̂::

        Σ_p h1_c  = (Σ_p x̂_p) · w_c
        Σ_p h1_c² = w_cᵀ (x̂ᵀ x̂) w_c

    so the GN statistics cost O(n·Cin²) extra MXU flops (≈ expand-conv/4,
    free in this bandwidth-bound regime) instead of 3 extra HBM passes over
    the 4×-wide h1 (write conv out, read for stats, read to normalize).  The
    caller applies ``h2 = act(conv(x̂) * a + b)`` — elementwise, fusable into
    the conv epilogue, so h1 never round-trips HBM.

    Exact in infinite precision; in bf16 the Gram runs with f32 accumulation
    (validated whole-model: MAE ~5e-3 vs the two-pass path at bf16).

    Returns (a, b): f32 [B, Chid] affine pairs.
    """
    b, = xhat.shape[:1]
    cin = xhat.shape[-1]
    chid = wexp.shape[1]
    n = int(np.prod(xhat.shape[1:-1]))
    flat = xhat.reshape(b, n, cin)
    aug = jnp.concatenate(
        [flat, jnp.ones((b, n, 1), flat.dtype)], axis=-1)
    # f32 accumulation always; HIGHEST precision when the model itself is
    # f32 so the variance identity keeps full accuracy (TPU dots otherwise
    # downcast f32 operands to bf16).
    prec = (jax.lax.Precision.HIGHEST if flat.dtype == jnp.float32 else
            jax.lax.Precision.DEFAULT)
    gram = jnp.einsum("bpc,bpd->bcd", aug, aug,
                      preferred_element_type=jnp.float32, precision=prec)
    g = gram[:, :cin, :cin]
    asum = gram[:, cin, :cin]                                # Σ_p x̂
    wf = wexp.astype(jnp.float32)
    # The W-projections feed the same E[h²]−E[h]² cancellation — they need
    # the same precision treatment as the Gram itself.
    m1 = jnp.einsum("bc,ce->be", asum, wf, precision=prec) / n   # E[h1_c]
    gw = jnp.einsum("bcd,de->bce", g, wf, precision=prec)
    m2 = jnp.einsum("ce,bce->be", wf, gw, precision=prec) / n    # E[h1_c²]
    mg = jnp.mean(m1.reshape(b, num_groups, chid // num_groups), axis=2)
    eg2 = jnp.mean(m2.reshape(b, num_groups, chid // num_groups), axis=2)
    var = jnp.maximum(eg2 - mg * mg, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mg, chid // num_groups, axis=1)      # [B, Chid]
    rstd_c = jnp.repeat(rstd, chid // num_groups, axis=1)

    fs = 1.0 + film_scale.astype(jnp.float32)
    fb = film_shift.astype(jnp.float32)
    gamma = scale.astype(jnp.float32)[None]
    beta = bias.astype(jnp.float32)[None]
    a = rstd_c * gamma * fs
    bb = (beta - mean_c * rstd_c * gamma) * fs + fb
    return a, bb


def group_norm_film(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                    film_scale: jnp.ndarray, film_shift: jnp.ndarray,
                    num_groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """Fused GroupNorm + FiLM modulation: ``gn(x) * (1 + s) + b``.

    The reference computes these as two separate stages
    (``src/models/efficient_unet.py:212-217``); fusing keeps the normalized
    tensor in registers/VMEM.  ``film_scale``/``film_shift`` are [B, C]
    (per-sample, per-channel).
    """
    orig_dtype = x.dtype
    c = x.shape[-1]
    xg, mean, rstd = _group_stats(x, num_groups, eps)
    xn = (xg.astype(jnp.float32) - mean) * rstd
    xf = xn.reshape(x.shape)
    xf = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    # Broadcast [B, C] FiLM params over spatial dims.
    b = x.shape[0]
    bshape = (b,) + (1,) * (x.ndim - 2) + (c,)
    fs = film_scale.astype(jnp.float32).reshape(bshape)
    fb = film_shift.astype(jnp.float32).reshape(bshape)
    out = xf * (1.0 + fs) + fb
    return out.astype(orig_dtype)
