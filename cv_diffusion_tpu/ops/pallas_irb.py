"""Fused inverted-residual-block Pallas TPU kernel (inference path).

One kernel computes the whole IRB chain
(``src/models/efficient_unet.py:203-236``)::

    out = project( SE( dwconv3x3( act( gn2(expand(act(gn1 x))) ⊙ FiLM ) ) ) )
          + residual

The per-batch-element input image is staged into VMEM **once** (a level-0
image is ~4 MB bf16; VMEM is 16 MB) and all intermediate activations are
recomputed from it tile-by-tile instead of round-tripping the 4×-wider hidden
tensor through HBM.  The model is bandwidth-bound (~19 flop/byte « v5e's ~240
balance), so recompute is effectively free: HBM traffic drops from ~6 hidden
round trips to *one read of x plus one write of out*.

Grid ``(B, 4, H_tiles)`` — four sequential phases per batch element:

  0. GN1 statistics over x
  1. GN2 statistics over h1 = expand(act(gn1 x))      (recomputed)
  2. SE pooling over h3 = dwconv(act(FiLM(gn2 h1)))   (recomputed, row halos)
  3. out tile = project(h3 · SE_gate) + residual      (recomputed, written)

Group statistics ride the MXU as matmuls against a one-hot channel→group map
(full 128-lane utilization instead of segmented VPU reductions).  The
depthwise conv's row halo comes from recomputing one extra row on each side
of the tile (the caller zero-pads the image by one row, matching torch's
``padding=1``).

Inference-only: training keeps the autodiff-friendly XLA path (same math).
Parity is tested in interpreter mode (tests/test_pallas_kernels.py) and the
compiled kernel is validated on hardware.

**Status: experimental, not the default.** Measured on v5e (batch 32,
level-0/level-1 shapes): correct to bf16 precision but ~1.3x slower than the
XLA op chain (14.8 vs 11.4 ms; 7.4 vs 5.9 ms).  The sequential
(B x 4-phase x H-tiles) grid costs ~4k Mosaic steps of small matmuls, and the
x3 recompute runs in f32 on the VPU — together they outweigh the HBM-traffic
savings at these sizes.  Future direction: merge phases over a VMEM-resident
image (two passes), bf16 VPU math, wider tiles with W folded into lanes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .norms import gn_num_groups


def _group_onehot(c: int, groups: int) -> np.ndarray:
    m = np.zeros((c, groups), np.float32)
    per = c // groups
    for i in range(c):
        m[i, i // per] = 1.0
    return m


def _kernel(x_ref,        # [1, H+2, W, Cin] (zero-padded rows, full image)
            wexp_ref,     # [Cin, Chid]
            wdw_ref,      # [3, 3, Chid]
            wproj_ref,    # [Chid, Cout]
            wskip_ref,    # [Cin, Cout] (zeros when residual is identity)
            gn1_ref,      # [2, Cin]  (scale; bias)
            gn2_ref,      # [2, Chid]
            film_ref,     # [1, 2, Chid] per-batch (scale; shift)
            se1_ref,      # [Chid, Csq]
            se1b_ref,     # [1, Csq]
            se2_ref,      # [Csq, Chid]
            se2b_ref,     # [1, Chid]
            g1map_ref,    # [Cin, G1]
            g2map_ref,    # [Chid, G2]
            o_ref,        # [1, th, W, Cout]
            stat1, stat2, se_acc, scale1, scale2, se_gate,
            *, tile_h: int, height: int, width: int, cin: int, chid: int,
            cout: int, g1: int, g2: int, eps: float, silu: bool,
            has_skip: bool, use_se: bool):
    phase = pl.program_id(1)
    ti = pl.program_id(2)
    n_tiles = pl.num_programs(2)

    def act(v):
        if silu:
            return v * jax.nn.sigmoid(v)
        return jnp.clip(v, 0.0, 6.0)

    # ---- recompute helpers -------------------------------------------
    def x_rows(extra_halo: bool):
        """Tile rows of the padded image as f32.

        Interior rows of tile ti live at padded rows
        [ti·th+1, ti·th+th+1); with halo the range is [ti·th, ti·th+th+2).
        """
        start = ti * tile_h
        if extra_halo:
            return x_ref[0, pl.ds(start, tile_h + 2)].astype(jnp.float32)
        return x_ref[0, pl.ds(start + 1, tile_h)].astype(jnp.float32)

    def gn1_apply(t):
        return ((t - scale1[0]) * scale1[1] *
                gn1_ref[0].astype(jnp.float32) +
                gn1_ref[1].astype(jnp.float32))

    def h1_rows(extra_halo: bool):
        t = act(gn1_apply(x_rows(extra_halo)))
        rows = tile_h + 2 if extra_halo else tile_h
        h1 = jnp.dot(t.reshape(rows * width, cin),
                     wexp_ref[:].astype(jnp.float32),
                     preferred_element_type=jnp.float32)
        return h1.reshape(rows, width, chid)

    def gn2_film_apply(t):
        normed = ((t - scale2[0]) * scale2[1] *
                  gn2_ref[0].astype(jnp.float32) +
                  gn2_ref[1].astype(jnp.float32))
        fs = film_ref[0, 0].astype(jnp.float32)
        fb = film_ref[0, 1].astype(jnp.float32)
        return normed * (1.0 + fs) + fb

    def h3_rows():
        """dwconv3x3(act(gn2+film(h1))) for the tile interior [th, W, Chid]."""
        h2 = act(gn2_film_apply(h1_rows(True)))          # [th+2, W, Chid]
        # Halo rows outside the real image must be ZERO h2 rows (torch pads
        # the depthwise input with zeros); recomputing them from the
        # zero-padded x would instead yield gn(0) ≠ 0.
        row = (jax.lax.broadcasted_iota(jnp.int32, (tile_h + 2, 1, 1), 0)
               + ti * tile_h - 1)
        h2 = jnp.where((row >= 0) & (row < height), h2, 0.0)
        h2p = jnp.pad(h2, ((0, 0), (1, 1), (0, 0)))      # zero-pad W
        w = wdw_ref[:].astype(jnp.float32)
        out = h2p[0:tile_h, 0:width, :] * w[0, 0]
        for dy in range(3):
            for dx in range(3):
                if dy == 0 and dx == 0:
                    continue
                out = out + h2p[dy:dy + tile_h, dx:dx + width, :] * w[dy, dx]
        return out

    # ---- phase 0: GN1 stats ------------------------------------------
    @pl.when(jnp.logical_and(phase == 0, ti == 0))
    def _():
        stat1[:] = jnp.zeros_like(stat1)

    @pl.when(phase == 0)
    def _():
        t = x_rows(False).reshape(tile_h * width, cin)
        g1m = g1map_ref[:].astype(jnp.float32)
        stat1[0:1] += jnp.dot(jnp.sum(t, axis=0, keepdims=True), g1m,
                              preferred_element_type=jnp.float32)
        stat1[1:2] += jnp.dot(jnp.sum(t * t, axis=0, keepdims=True), g1m,
                              preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(phase == 0, ti == n_tiles - 1))
    def _():
        n = jnp.float32(height * width * (cin // g1))
        mean_g = stat1[0] / n
        var_g = jnp.maximum(stat1[1] / n - mean_g * mean_g, 0.0)
        rstd_g = jax.lax.rsqrt(var_g + eps)
        g1m = g1map_ref[:].astype(jnp.float32)
        scale1[0:1] = jnp.dot(g1m, mean_g[:, None],
                              preferred_element_type=jnp.float32).T
        scale1[1:2] = jnp.dot(g1m, rstd_g[:, None],
                              preferred_element_type=jnp.float32).T

    # ---- phase 1: GN2 stats -------------------------------------------
    @pl.when(jnp.logical_and(phase == 1, ti == 0))
    def _():
        stat2[:] = jnp.zeros_like(stat2)

    @pl.when(phase == 1)
    def _():
        h1 = h1_rows(False).reshape(tile_h * width, chid)
        g2m = g2map_ref[:].astype(jnp.float32)
        stat2[0:1] += jnp.dot(jnp.sum(h1, axis=0, keepdims=True), g2m,
                              preferred_element_type=jnp.float32)
        stat2[1:2] += jnp.dot(jnp.sum(h1 * h1, axis=0, keepdims=True), g2m,
                              preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(phase == 1, ti == n_tiles - 1))
    def _():
        n = jnp.float32(height * width * (chid // g2))
        mean_g = stat2[0] / n
        var_g = jnp.maximum(stat2[1] / n - mean_g * mean_g, 0.0)
        rstd_g = jax.lax.rsqrt(var_g + eps)
        g2m = g2map_ref[:].astype(jnp.float32)
        scale2[0:1] = jnp.dot(g2m, mean_g[:, None],
                              preferred_element_type=jnp.float32).T
        scale2[1:2] = jnp.dot(g2m, rstd_g[:, None],
                              preferred_element_type=jnp.float32).T

    # ---- phase 2: SE pooling -------------------------------------------
    @pl.when(jnp.logical_and(phase == 2, ti == 0))
    def _():
        se_acc[:] = jnp.zeros_like(se_acc)
        se_gate[:] = jnp.ones_like(se_gate)

    if use_se:
        @pl.when(phase == 2)
        def _():
            se_acc[0:1] += jnp.sum(h3_rows(), axis=(0, 1))[None]

        @pl.when(jnp.logical_and(phase == 2, ti == n_tiles - 1))
        def _():
            pooled = se_acc[0:1] / jnp.float32(height * width)  # [1, Chid]
            s = jnp.dot(pooled, se1_ref[:].astype(jnp.float32),
                        preferred_element_type=jnp.float32)
            s = act(s + se1b_ref[:].astype(jnp.float32))
            s = jnp.dot(s, se2_ref[:].astype(jnp.float32),
                        preferred_element_type=jnp.float32)
            s = s + se2b_ref[:].astype(jnp.float32)
            se_gate[:] = jax.nn.sigmoid(s)

    # ---- phase 3: output -------------------------------------------------
    @pl.when(phase == 3)
    def _():
        h3 = h3_rows()
        if use_se:
            h3 = h3 * se_gate[0]
        out = jnp.dot(h3.reshape(tile_h * width, chid),
                      wproj_ref[:].astype(jnp.float32),
                      preferred_element_type=jnp.float32)
        out = out.reshape(tile_h, width, cout)
        xt = x_rows(False)
        if has_skip:
            res = jnp.dot(xt.reshape(tile_h * width, cin),
                          wskip_ref[:].astype(jnp.float32),
                          preferred_element_type=jnp.float32)
            out = out + res.reshape(tile_h, width, cout)
        else:
            out = out + xt
        o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("eps", "silu", "use_se", "tile_h"))
def fused_irb(x: jnp.ndarray,
              wexp: jnp.ndarray, wdw: jnp.ndarray, wproj: jnp.ndarray,
              gn1_scale: jnp.ndarray, gn1_bias: jnp.ndarray,
              gn2_scale: jnp.ndarray, gn2_bias: jnp.ndarray,
              film_scale: jnp.ndarray, film_shift: jnp.ndarray,
              se_w1: Optional[jnp.ndarray] = None,
              se_b1: Optional[jnp.ndarray] = None,
              se_w2: Optional[jnp.ndarray] = None,
              se_b2: Optional[jnp.ndarray] = None,
              wskip: Optional[jnp.ndarray] = None,
              eps: float = 1e-5, silu: bool = False, use_se: bool = True,
              tile_h: int = 16) -> jnp.ndarray:
    """Fused stride-1 IRB forward.

    Args:
      x: [B, H, W, Cin].
      wexp: [Cin, Chid].  wdw: [3, 3, Chid] (or [3,3,1,Chid]).
      wproj: [Chid, Cout].  wskip: [Cin, Cout] or None (identity residual).
      film_scale/shift: [B, Chid].
      se_*: SE dense params ([Chid,Csq],[Csq],[Csq,Chid],[Chid]); None when
        ``use_se=False``.
    Returns [B, H, W, Cout] in x.dtype.
    """
    b, height, width, cin = x.shape
    chid = wexp.shape[1]
    cout = wproj.shape[1]
    g1 = gn_num_groups(cin)
    g2 = gn_num_groups(chid)

    tile = min(tile_h, height)
    assert height % tile == 0, (height, tile)
    n_tiles = height // tile

    has_skip = wskip is not None
    if wskip is None:
        assert cin == cout, (cin, cout)
        wskip = jnp.zeros((cin, cout), x.dtype)
    if se_w1 is None:
        se_w1 = jnp.zeros((chid, 1), x.dtype)
        se_b1 = jnp.zeros((1,), x.dtype)
        se_w2 = jnp.zeros((1, chid), x.dtype)
        se_b2 = jnp.zeros((chid,), x.dtype)
    csq = se_w1.shape[1]

    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))

    gn1 = jnp.stack([gn1_scale, gn1_bias]).astype(jnp.float32)
    gn2 = jnp.stack([gn2_scale, gn2_bias]).astype(jnp.float32)
    film = jnp.stack([film_scale, film_shift], axis=1).astype(jnp.float32)
    g1map = jnp.asarray(_group_onehot(cin, g1))
    g2map = jnp.asarray(_group_onehot(chid, g2))
    wdw3 = wdw.reshape(3, 3, chid)

    def full_x(bi, ph, ti):
        return (bi, 0, 0, 0)

    def o_idx(bi, ph, ti):
        return (bi, ti, 0, 0)

    def const(shape):
        return pl.BlockSpec(shape, lambda bi, ph, ti: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_batch(shape):
        return pl.BlockSpec(shape,
                            lambda bi, ph, ti: (bi,) + (0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel, tile_h=tile, height=height, width=width, cin=cin,
        chid=chid, cout=cout, g1=g1, g2=g2, eps=eps, silu=silu,
        has_skip=has_skip, use_se=use_se)

    # The per-batch image block + double buffering + f32 tile temporaries
    # exceed the default 16M scoped-vmem budget; raise it (v5e has headroom
    # beyond the conservative default for single-buffered resident blocks).
    vmem_bytes = 64 * 1024 * 1024

    return pl.pallas_call(
        kernel,
        grid=(b, 4, n_tiles),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        in_specs=[
            pl.BlockSpec((1, height + 2, width, cin), full_x,
                         memory_space=pltpu.VMEM),
            const((cin, chid)),
            const((3, 3, chid)),
            const((chid, cout)),
            const((cin, cout)),
            const((2, cin)),
            const((2, chid)),
            per_batch((1, 2, chid)),
            const((chid, csq)),
            const((1, csq)),
            const((csq, chid)),
            const((1, chid)),
            const((cin, g1)),
            const((chid, g2)),
        ],
        out_specs=pl.BlockSpec((1, tile, width, cout), o_idx,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, height, width, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, g1), jnp.float32),
            pltpu.VMEM((2, g2), jnp.float32),
            pltpu.VMEM((1, chid), jnp.float32),
            pltpu.VMEM((2, cin), jnp.float32),
            pltpu.VMEM((2, chid), jnp.float32),
            pltpu.VMEM((1, chid), jnp.float32),
        ],
    )(xp, wexp, wdw3, wproj, wskip, gn1, gn2, film,
      se_w1, se_b1.reshape(1, -1), se_w2, se_b2.reshape(1, -1),
      g1map, g2map)


def irb_params_from_flax(irb_params: dict):
    """Extract fused_irb arguments from an ``InvertedResidualBlock`` param
    subtree (``models/blocks.py``)."""
    p = irb_params
    args = dict(
        wexp=p["expand"]["kernel"][0, 0],
        wdw=p["depthwise"]["kernel"],
        wproj=p["project"]["kernel"][0, 0],
        gn1_scale=p["norm1"]["scale"], gn1_bias=p["norm1"]["bias"],
        gn2_scale=p["norm2_scale"], gn2_bias=p["norm2_bias"],
    )
    if "se" in p:
        args.update(se_w1=p["se"]["fc1"]["kernel"],
                    se_b1=p["se"]["fc1"]["bias"],
                    se_w2=p["se"]["fc2"]["kernel"],
                    se_b2=p["se"]["fc2"]["bias"])
    if "skip" in p:
        args["wskip"] = p["skip"]["kernel"][0, 0]
    return args


# ======================================================================
# v2: phase-merged fused IRB (the round-2 redesign the v1 docstring plans)
# ======================================================================
#
# What changed vs v1 (measured 1.3x slower than XLA):
#
#   * GN statistics leave the kernel entirely.  GN1 stats are a cheap fused
#     XLA reduction over x.  GN2 stats come from the Gram identity
#     sum_p h1_c^2 = w_c^T (x̂^T x̂) w_c  — one [Cin+1, Cin+1] augmented-Gram
#     matmul over x̂ = act(gn1 x) gives every per-channel first and second
#     moment of h1 = x̂ W_exp WITHOUT computing h1, so both GroupNorms fold
#     into per-(batch, channel) affine scales the kernel just applies.
#   * The SE global-average pool over h3 = dwconv(h2) is computed EXACTLY
#     from h2 edge sums:  sum_p h3 = Σ_{dy,dx} w[dy,dx] · T(dy,dx)  where
#     each T is the h2 total minus one edge row/col (± a corner) — so the SE
#     gate needs h2, not h3, and the dwconv runs ONCE instead of twice.
#   * Grid collapses from (B, 4, tiles) to (B, 2, tiles) — (B, 1, tiles)
#     without SE — and MXU dots take bf16 operands (f32 accumulate) instead
#     of f32, halving VMEM pressure and step count ~4x at the bench batch.
#
# Per-tile work: phase 0 = expand dot + act (SE edge accumulation);
# phase 1 = expand dot (+2 halo rows) + 9-tap dwconv + project dot + write.
# HBM traffic per block: read x (+scales/weights) + write out — the 4-6
# round trips over the 4x-wide hidden that XLA materializes are gone.


def _kernel_v2(x_ref,       # [1, H+2, W, Cin] (zero-padded rows, resident)
               s1_ref,      # [1, 2, Cin]  folded GN1 affine (a, b)
               s2_ref,      # [1, 2, Chid] folded GN2+FiLM affine (a, b)
               wexp_ref,    # [Cin, Chid]
               wdw_ref,     # [3, 3, Chid]
               wproj_ref,   # [Chid, Cout]
               wskip_ref,   # [Cin, Cout] (zeros when identity residual)
               se1_ref, se1b_ref, se2_ref, se2b_ref,
               o_ref,       # [1, th, W, Cout]
               edge, gate,  # scratch: [9, Chid] f32, [1, Chid] f32
               *, tile_h: int, height: int, width: int, cin: int,
               chid: int, cout: int, silu: bool, has_skip: bool,
               use_se: bool, n_phases: int):
    phase = pl.program_id(1)
    ti = pl.program_id(2)
    n_tiles = pl.num_programs(2)
    out_phase = n_phases - 1

    def act(v):
        if silu:
            return v * jax.nn.sigmoid(v)
        return jnp.clip(v, 0.0, 6.0)

    # bf16 MXU operands when the model runs bf16; f32 for f32 parity
    dot_t = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32

    def x_rows(halo: bool):
        """Rows of padded x for tile ti (interior at [ti*th+1, ti*th+th+1))."""
        start = ti * tile_h
        if halo:
            return x_ref[0, pl.ds(start, tile_h + 2)]
        return x_ref[0, pl.ds(start + 1, tile_h)]

    def h2_rows(halo: bool):
        """h2 = act(a2 · (x̂ W_exp) + b2) for the tile (f32)."""
        rows = tile_h + 2 if halo else tile_h
        xt = x_rows(halo).astype(jnp.float32)
        xhat = act(xt * s1_ref[0, 0].astype(jnp.float32)
                   + s1_ref[0, 1].astype(jnp.float32))
        h1 = jnp.dot(xhat.astype(dot_t).reshape(rows * width, cin),
                     wexp_ref[:].astype(dot_t),
                     preferred_element_type=jnp.float32)
        h1 = h1.reshape(rows, width, chid)
        return act(h1 * s2_ref[0, 0].astype(jnp.float32)
                   + s2_ref[0, 1].astype(jnp.float32))

    # ---- phase 0 (only when use_se): exact SE pool from h2 edge sums ----
    if use_se:
        @pl.when(jnp.logical_and(phase == 0, ti == 0))
        def _():
            edge[:] = jnp.zeros_like(edge)

        @pl.when(phase == 0)
        def _():
            h2 = h2_rows(False)                      # [th, W, Chid]
            # Masked full reductions instead of slice-then-reduce: Mosaic
            # rejects reductions whose input layout has non-zero offsets
            # over the reduced dims (e.g. sum over h2[:, W-1, :]).
            row = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, 1, 1), 0)
                   + ti * tile_h)                    # global row index
            col = jax.lax.broadcasted_iota(jnp.int32, (1, width, 1), 1)

            def msum(mask):
                return jnp.sum(jnp.where(mask, h2, 0.0), axis=(0, 1))[None]

            first_r, last_r = row == 0, row == height - 1
            first_c, last_c = col == 0, col == width - 1
            edge[0:1] += jnp.sum(h2, axis=(0, 1))[None]
            edge[1:2] += msum(first_r)
            edge[2:3] += msum(last_r)
            edge[3:4] += msum(first_c)
            edge[4:5] += msum(last_c)
            edge[5:6] += msum(first_r & first_c)
            edge[6:7] += msum(first_r & last_c)
            edge[7:8] += msum(last_r & first_c)
            edge[8:9] += msum(last_r & last_c)

        @pl.when(jnp.logical_and(phase == 0, ti == n_tiles - 1))
        def _():
            w = wdw_ref[:].astype(jnp.float32)       # [3, 3, Chid]
            tot = edge[0]
            row0, row_h = edge[1], edge[2]
            col0, col_w = edge[3], edge[4]
            c00, c0w, ch0, chw = edge[5], edge[6], edge[7], edge[8]
            pooled = jnp.zeros((chid,), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    t = tot
                    if dy == 0:
                        t = t - row_h
                    elif dy == 2:
                        t = t - row0
                    if dx == 0:
                        t = t - col_w
                    elif dx == 2:
                        t = t - col0
                    # corner double-subtracted when both an edge row and an
                    # edge col are excluded → add it back once
                    if dy == 0 and dx == 0:
                        t = t + chw
                    elif dy == 0 and dx == 2:
                        t = t + ch0
                    elif dy == 2 and dx == 0:
                        t = t + c0w
                    elif dy == 2 and dx == 2:
                        t = t + c00
                    pooled = pooled + w[dy, dx] * t
            pooled = pooled / jnp.float32(height * width)
            s = jnp.dot(pooled[None].astype(jnp.float32), se1_ref[:].astype(
                jnp.float32), preferred_element_type=jnp.float32)
            s = act(s + se1b_ref[:].astype(jnp.float32))
            s = jnp.dot(s, se2_ref[:].astype(jnp.float32),
                        preferred_element_type=jnp.float32)
            gate[:] = jax.nn.sigmoid(s + se2b_ref[:].astype(jnp.float32))

    # ---- output phase: dwconv once, gate, project, residual, write ------
    @pl.when(phase == out_phase)
    def _():
        h2 = h2_rows(True)                           # [th+2, W, Chid]
        # halo rows outside the real image are zero h2 rows (torch zero-pads
        # the depthwise INPUT) — never gn/act of a zero x row
        row = (jax.lax.broadcasted_iota(jnp.int32, (tile_h + 2, 1, 1), 0)
               + ti * tile_h - 1)
        h2 = jnp.where((row >= 0) & (row < height), h2, 0.0)
        h2p = jnp.pad(h2, ((0, 0), (1, 1), (0, 0)))  # zero-pad W
        w = wdw_ref[:].astype(jnp.float32)
        h3 = h2p[0:tile_h, 0:width, :] * w[0, 0]
        for dy in range(3):
            for dx in range(3):
                if dy == 0 and dx == 0:
                    continue
                h3 = h3 + h2p[dy:dy + tile_h, dx:dx + width, :] * w[dy, dx]
        if use_se:
            h3 = h3 * gate[0]
        out = jnp.dot(h3.astype(dot_t).reshape(tile_h * width, chid),
                      wproj_ref[:].astype(dot_t),
                      preferred_element_type=jnp.float32)
        out = out.reshape(tile_h, width, cout)
        xt = x_rows(False).astype(jnp.float32)
        if has_skip:
            res = jnp.dot(xt.astype(dot_t).reshape(
                tile_h * width, cin), wskip_ref[:].astype(dot_t),
                preferred_element_type=jnp.float32)
            out = out + res.reshape(tile_h, width, cout)
        else:
            out = out + xt
        o_ref[0] = out.astype(o_ref.dtype)


def _folded_gn_scales(x, wexp, gn1_scale, gn1_bias, gn2_scale, gn2_bias,
                      film_scale, film_shift, eps, silu):
    """XLA-side GN folding: per-(batch, channel) affine (a, b) pairs.

    GN1 stats are one fused f32 reduction over x; GN2 stats use the
    augmented-Gram identity on x̂ = act(gn1 x):

        Σ_p h1_c   = (Σ_p x̂_p) · w_c
        Σ_p h1_c²  = w_cᵀ (x̂ᵀ x̂) w_c

    so h1 = x̂ W_exp is never materialized.  Costs ~2 fused passes over x
    plus O(Cin²·Chid) MXU flops — negligible beside the hidden-tensor round
    trips it eliminates.
    """
    b, height, width, cin = x.shape
    g1 = gn_num_groups(cin)
    g2 = gn_num_groups(wexp.shape[1])
    n = height * width
    xf = x.astype(jnp.float32)

    # --- GN1 (plain fused reduce) ---
    xg = xf.reshape(b, n, g1, cin // g1)
    mean1 = jnp.mean(xg, axis=(1, 3))                            # [B, G1]
    var1 = jnp.maximum(jnp.mean(xg * xg, axis=(1, 3))
                       - mean1 * mean1, 0.0)
    rstd1 = jax.lax.rsqrt(var1 + eps)
    mean1c = jnp.repeat(mean1, cin // g1, axis=1)                # [B, Cin]
    rstd1c = jnp.repeat(rstd1, cin // g1, axis=1)
    a1 = rstd1c * gn1_scale.astype(jnp.float32)[None]
    b1 = (gn1_bias.astype(jnp.float32)[None] - mean1c * a1)

    # --- GN2 via augmented Gram of x̂ ---
    def act(v):
        if silu:
            return v * jax.nn.sigmoid(v)
        return jnp.clip(v, 0.0, 6.0)

    xhat = act(xf * a1[:, None, None, :] + b1[:, None, None, :])
    # GN2⊕FiLM via the augmented Gram of x̂ — the single implementation in
    # ops/norms.gn2_film_affine_gram (which carries the Precision.HIGHEST
    # fix for the E[h²]−E[h]² cancellation under TPU's bf16-multiply f32
    # dots); an earlier inline copy here had silently drifted from it.
    from .norms import gn2_film_affine_gram

    a2, b2 = gn2_film_affine_gram(xhat, wexp, gn2_scale, gn2_bias,
                                  film_scale, film_shift,
                                  num_groups=g2, eps=eps)
    s1 = jnp.stack([a1, b1], axis=1)                             # [B, 2, Cin]
    s2 = jnp.stack([a2, b2], axis=1)                             # [B, 2, Chid]
    return s1, s2


@functools.partial(jax.jit,
                   static_argnames=("eps", "silu", "use_se", "tile_h",
                                    "interpret"))
def fused_irb_v2(x: jnp.ndarray,
                 wexp: jnp.ndarray, wdw: jnp.ndarray, wproj: jnp.ndarray,
                 gn1_scale: jnp.ndarray, gn1_bias: jnp.ndarray,
                 gn2_scale: jnp.ndarray, gn2_bias: jnp.ndarray,
                 film_scale: jnp.ndarray, film_shift: jnp.ndarray,
                 se_w1: Optional[jnp.ndarray] = None,
                 se_b1: Optional[jnp.ndarray] = None,
                 se_w2: Optional[jnp.ndarray] = None,
                 se_b2: Optional[jnp.ndarray] = None,
                 wskip: Optional[jnp.ndarray] = None,
                 eps: float = 1e-5, silu: bool = False, use_se: bool = True,
                 tile_h: int = 32,
                 interpret: Optional[bool] = None) -> jnp.ndarray:
    """Phase-merged fused stride-1 IRB forward (inference path).

    Same signature/semantics as ``fused_irb``; see the section comment for
    the redesign.  ``interpret``: None = auto (Pallas interpreter on CPU —
    tests / the virtual mesh — compiled Mosaic on TPU).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    b, height, width, cin = x.shape
    chid = wexp.shape[1]
    cout = wproj.shape[1]

    tile = min(tile_h, height)
    while height % tile:
        tile -= 1
    n_tiles = height // tile

    has_skip = wskip is not None
    if wskip is None:
        assert cin == cout, (cin, cout)
        wskip = jnp.zeros((cin, cout), x.dtype)
    if se_w1 is None:
        se_w1 = jnp.zeros((chid, 1), x.dtype)
        se_b1 = jnp.zeros((1,), x.dtype)
        se_w2 = jnp.zeros((1, chid), x.dtype)
        se_b2 = jnp.zeros((chid,), x.dtype)
    csq = se_w1.shape[1]

    s1, s2 = _folded_gn_scales(x, wexp, gn1_scale, gn1_bias, gn2_scale,
                               gn2_bias, film_scale, film_shift, eps, silu)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    wdw3 = wdw.reshape(3, 3, chid)
    n_phases = 2 if use_se else 1

    def const(shape):
        return pl.BlockSpec(shape, lambda bi, ph, ti: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_batch(shape):
        return pl.BlockSpec(shape,
                            lambda bi, ph, ti: (bi,) + (0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel_v2, tile_h=tile, height=height, width=width, cin=cin,
        chid=chid, cout=cout, silu=silu, has_skip=has_skip, use_se=use_se,
        n_phases=n_phases)

    kwargs = {}
    if interpret:
        kwargs["interpret"] = True
    else:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)

    return pl.pallas_call(
        kernel,
        grid=(b, n_phases, n_tiles),
        in_specs=[
            pl.BlockSpec((1, height + 2, width, cin),
                         lambda bi, ph, ti: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            per_batch((1, 2, cin)),
            per_batch((1, 2, chid)),
            const((cin, chid)),
            const((3, 3, chid)),
            const((chid, cout)),
            const((cin, cout)),
            const((chid, csq)),
            const((1, csq)),
            const((csq, chid)),
            const((1, chid)),
        ],
        # During the SE phase no output tile is written; mapping every phase-0
        # step to block 0 keeps Mosaic from flushing n_tiles garbage blocks
        # (same index → no copy-back until the real output phase).
        out_specs=pl.BlockSpec(
            (1, tile, width, cout),
            (lambda bi, ph, ti: (bi, ti, 0, 0)) if n_phases == 1
            else (lambda bi, ph, ti: (bi, ph * ti, 0, 0)),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, height, width, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((9, chid), jnp.float32),
            pltpu.VMEM((1, chid), jnp.float32),
        ],
        **kwargs,
    )(xp, s1, s2, wexp, wdw3, wproj, wskip,
      se_w1, se_b1.reshape(1, -1), se_w2, se_b2.reshape(1, -1))
