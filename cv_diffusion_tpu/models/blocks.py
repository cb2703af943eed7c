"""EfficientUNet building blocks — flax.linen, NHWC, TPU-first.

Every block mirrors a reference module's math (citations inline) but is laid
out for XLA/TPU: NHWC activations, explicit (1,1)-pair conv padding so strided
convs tile exactly like the reference's ``padding=1``, float32 norm
statistics, and compute-dtype control for bfloat16.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import (linear_attention, standard_attention,
                             standard_attention_flash)
from ..ops.norms import (concat_group_norm_parts, gn_num_groups,
                         gn2_film_affine_gram, group_norm, group_norm_film)
from ..ops.qconv import QConv

Dtype = Any

PAD1 = ((1, 1), (1, 1))  # torch Conv2d(padding=1) equivalent for 3x3 kernels


def activation(x: jnp.ndarray, quantization_friendly: bool) -> jnp.ndarray:
    """ReLU6 when quantization friendly, SiLU otherwise
    (``src/models/efficient_unet.py:94,167``)."""
    if quantization_friendly:
        return jnp.clip(x, 0.0, 6.0)
    return jax.nn.silu(x)


def sinusoidal_pos_emb(t: jnp.ndarray, dim: int,
                       max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal timestep embedding, ``[cos, sin]`` concat order
    (``src/models/efficient_unet.py:60-76``).

    Args:
      t: [B] int or float timesteps.
    Returns:
      [B, dim] float32.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class GroupNorm(nn.Module):
    """GroupNorm with torch-parity group count and float32 statistics."""

    max_groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm(x, scale, bias, gn_num_groups(c, self.max_groups),
                          self.eps)


class TimeEmbedding(nn.Module):
    """SinPosEmb(base_ch) → Dense(time_dim) → SiLU → Dense(time_dim)
    (``src/models/efficient_unet.py:412-417``)."""

    base_channels: int
    time_embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        emb = sinusoidal_pos_emb(t, self.base_channels)
        emb = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="dense1")(emb)
        emb = jax.nn.silu(emb)
        emb = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="dense2")(emb)
        return emb


class SqueezeExcitation(nn.Module):
    """Channel attention: mean-pool → 1×1 squeeze → act → 1×1 expand → sigmoid
    (``src/models/efficient_unet.py:79-100``)."""

    ratio: float = 0.25
    quantization_friendly: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        squeezed = max(1, int(c * self.ratio))
        # Global average pool over spatial dims → [B, C].
        s = x.mean(axis=(1, 2))
        s = nn.Dense(squeezed, dtype=self.dtype, name="fc1")(s)
        s = activation(s, self.quantization_friendly)
        s = nn.Dense(c, dtype=self.dtype, name="fc2")(s)
        s = jax.nn.sigmoid(s.astype(jnp.float32)).astype(x.dtype)
        return x * s[:, None, None, :]


class DepthwiseSeparableConv(nn.Module):
    """Depthwise 3×3 + pointwise 1×1 (``src/models/efficient_unet.py:103-131``).

    Present for API parity; like the reference, the UNet blocks inline their
    own depthwise conv instead of using this.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        pad = self.kernel_size // 2
        x = nn.Conv(c, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    feature_group_count=c, use_bias=self.use_bias,
                    dtype=self.dtype, name="depthwise")(x)
        x = nn.Conv(self.features, (1, 1), use_bias=self.use_bias,
                    dtype=self.dtype, name="pointwise")(x)
        return x


def _conv1x1(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Plain 1×1 NHWC conv on an explicit [1,1,I,O] kernel slice (keeps the
    conv form — XLA fuses conv epilogues better than reshaped dots on TPU;
    the 1×1-as-Dense rewrite measured 2× slower whole-model)."""
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, kernel, (1, 1), "VALID",
                                        dimension_numbers=dn)


class InvertedResidualBlock(nn.Module):
    """MobileNetV3-style inverted residual with FiLM time conditioning.

    Structure (``src/models/efficient_unet.py:134-236``):
    GN → act → 1×1 expand → GN ⊕ FiLM(time) → act → 3×3 depthwise → SE →
    1×1 project → dropout → residual (1×1 skip conv on channel change).
    """

    out_channels: int
    expansion_ratio: int = 4
    stride: int = 1
    use_se: bool = True
    se_ratio: float = 0.25
    dropout: float = 0.0
    quantization_friendly: bool = True
    act_quant: bool = False
    use_pallas_irb: bool = False
    fold_gn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, time_emb: jnp.ndarray,
                 train: bool = False,
                 skip_input: jnp.ndarray = None) -> jnp.ndarray:
        # Concat-free decoder entry (UNetConfig.split_skip): when the UNet
        # passes the skip tensor separately, GN1 + act + expand + the 1×1
        # residual conv all run SPLIT across the would-be concat boundary —
        # conv(concat(u, s)) ≡ conv_u(u) + conv_s(s) and the GN statistics
        # combine from per-part partial sums (ops/norms.
        # concat_group_norm_parts) — so the concatenated tensor (the graph's
        # largest at 256²) is never materialized.  Params are IDENTICAL to
        # the concat path (init always concatenates), so checkpoints are
        # shared and the knob is a pure graph rewrite.
        if skip_input is not None:
            split_ok = (self.stride == 1 and not self.act_quant
                        and not self.use_pallas_irb and not self.fold_gn
                        and not self.is_initializing()
                        and x.shape[-1] + skip_input.shape[-1]
                        != self.out_channels)
            if not split_ok:
                x = jnp.concatenate([x, skip_input.astype(x.dtype)], axis=-1)
                skip_input = None
        split_u_ch = x.shape[-1]
        in_channels = x.shape[-1] + (0 if skip_input is None
                                     else skip_input.shape[-1])
        hidden = int(in_channels * self.expansion_ratio)
        use_residual = self.stride == 1 and in_channels == self.out_channels
        residual = x
        # int8 compute path: ReLU6-clipped tensors have a *static* [0, 6]
        # range (no calibration); SiLU/unbounded inputs calibrate an amax.
        bound6 = 6.0 if self.quantization_friendly else None

        # FiLM: scale/shift from SiLU → Dense(2*hidden)
        # (``efficient_unet.py:189-191,214-217``); fused with the second GN.
        # Computed up front so both execution paths share it.
        t = nn.Dense(hidden * 2, dtype=self.dtype, name="time_mlp")(
            jax.nn.silu(time_emb))
        film_scale, film_shift = jnp.split(t, 2, axis=-1)
        gn_scale = self.param("norm2_scale", nn.initializers.ones,
                              (hidden,), jnp.float32)
        gn_bias = self.param("norm2_bias", nn.initializers.zeros,
                             (hidden,), jnp.float32)

        # Inference fast path: the whole IRB chain as one Pallas kernel
        # (ops/pallas_irb.fused_irb_v2) — one HBM read of x + one write of
        # out instead of round-tripping the 4x-wide hidden.  Init and
        # training run the standard XLA path (same math, autodiff-friendly),
        # so the param structure is identical and checkpoints are shared.
        if (self.use_pallas_irb and self.stride == 1 and not train
                and not self.act_quant and not self.is_initializing()):
            from ..ops.pallas_irb import fused_irb_v2

            p = self.variables["params"]
            kw = dict(
                wexp=p["expand"]["kernel"][0, 0],
                wdw=p["depthwise"]["kernel"],
                wproj=p["project"]["kernel"][0, 0],
                gn1_scale=p["norm1"]["scale"], gn1_bias=p["norm1"]["bias"],
                gn2_scale=gn_scale, gn2_bias=gn_bias,
                film_scale=film_scale, film_shift=film_shift,
                silu=not self.quantization_friendly, use_se=self.use_se)
            if self.use_se:
                kw.update(se_w1=p["se"]["fc1"]["kernel"],
                          se_b1=p["se"]["fc1"]["bias"],
                          se_w2=p["se"]["fc2"]["kernel"],
                          se_b2=p["se"]["fc2"]["bias"])
            if not use_residual and in_channels != self.out_channels:
                kw["wskip"] = p["skip"]["kernel"][0, 0]
            return fused_irb_v2(x, **kw)

        fold = False
        if skip_input is not None:
            # Split path: GN over the virtual concat via combined partial
            # sums; normalize+act fuse into each branch's 1×1 conv; the two
            # partial products sum.  Same params, never the concat.
            p = self.variables["params"]
            u_hat, s_hat = concat_group_norm_parts(
                x, skip_input, p["norm1"]["scale"], p["norm1"]["bias"],
                gn_num_groups(in_channels))
            u_hat = activation(u_hat, self.quantization_friendly)
            s_hat = activation(s_hat, self.quantization_friendly)
            wexp = p["expand"]["kernel"].astype(self.dtype)  # [1,1,C,hidden]
            h = (_conv1x1(u_hat.astype(self.dtype), wexp[:, :, :split_u_ch])
                 + _conv1x1(s_hat.astype(self.dtype),
                            wexp[:, :, split_u_ch:]))
        else:
            h = GroupNorm(name="norm1")(x)
            h = activation(h, self.quantization_friendly)

            # Graph-level inference fold (fold_gn): GN2⊕FiLM statistics of
            # the expand output come from the augmented Gram of x̂
            # (gn2_film_affine_gram), so the 4×-wide h1 is consumed as a
            # pure elementwise affine in the conv epilogue instead of
            # round-tripping HBM three times (write + stats read +
            # normalize read).  Same math; training/init keep the two-pass
            # autodiff path.
            fold = (self.fold_gn and not train and not self.act_quant
                    and not self.is_initializing())
            if fold:
                wexp = self.variables["params"]["expand"]["kernel"][0, 0]
                a2, b2 = gn2_film_affine_gram(
                    h, wexp, gn_scale, gn_bias, film_scale, film_shift,
                    gn_num_groups(hidden))

            h = QConv(hidden, (1, 1), use_bias=False, dtype=self.dtype,
                      act_quant=self.act_quant, act_bound=bound6,
                      name="expand")(h)

        if fold:
            bshape = (h.shape[0], 1, 1, hidden)
            h = (h.astype(jnp.float32) * a2.reshape(bshape)
                 + b2.reshape(bshape)).astype(h.dtype)
        else:
            h = group_norm_film(h, gn_scale, gn_bias, film_scale, film_shift,
                                gn_num_groups(hidden))

        h = activation(h, self.quantization_friendly)
        h = QConv(hidden, (3, 3), strides=(self.stride, self.stride),
                  padding=PAD1, feature_group_count=hidden, use_bias=False,
                  dtype=self.dtype, act_quant=self.act_quant,
                  act_bound=bound6, name="depthwise")(h)

        if self.use_se:
            h = SqueezeExcitation(
                ratio=self.se_ratio,
                quantization_friendly=self.quantization_friendly,
                dtype=self.dtype, name="se")(h)

        # The depthwise output is un-activated (unbounded), so the project
        # input needs a calibrated scale even in quantization-friendly mode.
        h = QConv(self.out_channels, (1, 1), use_bias=False,
                  dtype=self.dtype, act_quant=self.act_quant,
                  name="project")(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)

        if skip_input is not None:
            # split 1×1 residual projection over the virtual concat
            wsk = self.variables["params"]["skip"]["kernel"].astype(
                self.dtype)
            h = h + (_conv1x1(x.astype(self.dtype), wsk[:, :, :split_u_ch])
                     + _conv1x1(skip_input.astype(self.dtype),
                                wsk[:, :, split_u_ch:]))
        elif not use_residual and in_channels != self.out_channels:
            residual = QConv(self.out_channels, (1, 1),
                             strides=(self.stride, self.stride),
                             use_bias=False, dtype=self.dtype,
                             act_quant=self.act_quant, name="skip")(residual)
            h = h + residual
        elif use_residual:
            h = h + residual
        # Reference quirk kept: stride != 1 with in == out adds no residual
        # (``efficient_unet.py:198-201,230-234``).
        return h


class LinearAttentionBlock(nn.Module):
    """GN → 1×1 qkv → φ-linear attention → 1×1 out + GN → +residual
    (``src/models/efficient_unet.py:239-308``)."""

    num_heads: int = 4
    dim_head: int = 32
    use_pallas: bool = False
    act_quant: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, hgt, wid, c = x.shape
        inner = self.num_heads * self.dim_head
        residual = x

        h = GroupNorm(name="norm")(x)
        qkv = QConv(inner * 3, (1, 1), use_bias=False, dtype=self.dtype,
                    act_quant=self.act_quant, name="to_qkv")(h)
        qkv = qkv.reshape(b, hgt * wid, 3, self.num_heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        # The Pallas kernel carries a custom VJP (analytic XLA backward,
        # ops/pallas_attention.py), so the same path serves train and eval.
        out = linear_attention(q, k, v, use_pallas=self.use_pallas)

        out = out.reshape(b, hgt, wid, inner)
        out = QConv(c, (1, 1), use_bias=False, dtype=self.dtype,
                    act_quant=self.act_quant, name="to_out")(out)
        out = GroupNorm(name="out_norm")(out)
        return out + residual


class StandardAttentionBlock(nn.Module):
    """GN → 1×1 qkv → softmax attention → 1×1 out → +residual
    (``src/models/efficient_unet.py:311-357``).

    With ``use_pallas`` the softmax attention runs through JAX's stock Pallas
    flash-attention kernel (O(N) memory) — required for 512²+ resolutions
    when ``use_linear_attention=False``.
    """

    num_heads: int = 4
    dim_head: int = 32
    use_pallas: bool = False
    act_quant: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        del train  # the flash kernel ships its own VJP; path is train-safe
        b, hgt, wid, c = x.shape
        inner = self.num_heads * self.dim_head
        residual = x

        h = GroupNorm(name="norm")(x)
        qkv = QConv(inner * 3, (1, 1), use_bias=False, dtype=self.dtype,
                    act_quant=self.act_quant, name="to_qkv")(h)
        qkv = qkv.reshape(b, hgt * wid, 3, self.num_heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        if self.use_pallas:
            out = standard_attention_flash(q, k, v,
                                           scale=self.dim_head ** -0.5)
        else:
            out = standard_attention(q, k, v, scale=self.dim_head ** -0.5)

        out = out.reshape(b, hgt, wid, inner)
        out = QConv(c, (1, 1), use_bias=False, dtype=self.dtype,
                    act_quant=self.act_quant, name="to_out")(out)
        return out + residual


class Downsample(nn.Module):
    """3×3 stride-2 conv (or 2×2 average pool)
    (``src/models/efficient_unet.py:360-372``)."""

    use_conv: bool = True
    act_quant: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_conv:
            return QConv(x.shape[-1], (3, 3), strides=(2, 2), padding=PAD1,
                         dtype=self.dtype, act_quant=self.act_quant,
                         name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Upsample(nn.Module):
    """Bilinear ×2 (half-pixel centers ≡ torch align_corners=False) + 3×3 conv
    (``src/models/efficient_unet.py:375-384``)."""

    act_quant: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        up = jax.image.resize(x.astype(jnp.float32), (b, h * 2, w * 2, c),
                              method="bilinear").astype(x.dtype)
        return QConv(c, (3, 3), padding=PAD1, dtype=self.dtype,
                     act_quant=self.act_quant, name="conv")(up)
