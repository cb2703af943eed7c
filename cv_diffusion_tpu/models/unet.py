"""EfficientUNet — 4-level time-conditioned UNet, flax.linen, NHWC.

Topology mirrors the reference ``EfficientUNet``
(``src/models/efficient_unet.py:387-628``) exactly:

* encoder: per level, ``num_res_blocks`` IRBs (+ attention after each block
  when the level's resolution ∈ ``attention_resolutions``), one skip pushed
  per level *pre*-downsample, stride-2 conv downsample between levels;
* middle: IRB → attention → IRB;
* decoder: bilinear upsample between levels, skip concat doubles the first
  block's input channels, ``num_res_blocks + 1`` IRBs per level;
* final GN → SiLU → 3×3 conv.

Including the behavioral quirk that at ``image_size=256`` with the default
``attention_resolutions=(16, 8)`` no attention is instantiated anywhere except
the middle block (resolutions visited are {256,128,64,32}).

Parameter-count parity (verified against the reference with 6 input channels):
small = 18,008,035 and large = 86,809,155.  The reference's "tiny" and "base"
variants crash on construction (GroupNorm(32, 48)); ours run, using the
largest valid group count (see ``ops/norms.py``).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import UNetConfig, unet_config
from ..ops.qconv import QConv
from .blocks import (Downsample, InvertedResidualBlock, LinearAttentionBlock,
                     StandardAttentionBlock, TimeEmbedding, Upsample,
                     GroupNorm, PAD1)


class EfficientUNet(nn.Module):
    """Efficient UNet for conditional diffusion, NHWC.

    Call: ``unet.apply(params, x, timestep)`` with ``x`` [B, H, W, C] and
    ``timestep`` [B] (int). Returns [B, H, W, out_channels].
    """

    config: UNetConfig

    def _dtype(self):
        return jnp.dtype(self.config.dtype)

    def _remat_here(self, name: str) -> bool:
        cfg = self.config
        if not cfg.remat:
            return False
        if cfg.remat_scope == "all":
            return True
        if cfg.remat_scope == "decoder":
            # the widest activations: mid + decoder (incl. final upsamples)
            return name.startswith(("mid", "dec", "up"))
        raise ValueError(f"Unknown remat_scope: {cfg.remat_scope!r}")

    def _remat_policy(self):
        cfg = self.config
        if cfg.remat_policy == "full":
            return None      # save nothing — classic checkpoint
        if cfg.remat_policy == "conv":
            # save the tagged QConv outputs (ops/qconv.py); recompute only
            # the elementwise work between convs in the backward
            return jax.checkpoint_policies.save_only_these_names("conv_out")
        raise ValueError(f"Unknown remat_policy: {cfg.remat_policy!r}")

    def _attention(self, name: str):
        cfg = self.config
        attn_cls = (LinearAttentionBlock if cfg.use_linear_attention
                    else StandardAttentionBlock)
        if self._remat_here(name):
            # __call__(self, x, train) — `train` (index 2, counting self)
            # is a static python bool.
            attn_cls = nn.remat(attn_cls, static_argnums=(2,),
                                policy=self._remat_policy())
        return attn_cls(
            num_heads=cfg.num_attention_heads,
            dim_head=cfg.attention_head_dim, use_pallas=cfg.use_pallas,
            act_quant=cfg.act_quant, dtype=self._dtype(), name=name)

    def _irb(self, out_ch: int, name: str):
        cfg = self.config
        irb_cls = InvertedResidualBlock
        if self._remat_here(name):
            # __call__(self, x, time_emb, train, skip_input) — static
            # `train` at index 3.
            irb_cls = nn.remat(irb_cls, static_argnums=(3,),
                               policy=self._remat_policy())
        return irb_cls(
            out_channels=out_ch,
            expansion_ratio=cfg.expansion_ratio,
            use_se=cfg.use_se,
            se_ratio=cfg.se_ratio,
            dropout=cfg.dropout,
            quantization_friendly=cfg.quantization_friendly,
            act_quant=cfg.act_quant,
            use_pallas_irb=cfg.use_pallas_irb,
            fold_gn=cfg.fold_gn,
            dtype=self._dtype(), name=name)

    @nn.compact
    def __call__(self, x: jnp.ndarray, timestep: jnp.ndarray,
                 train: bool = False,
                 return_features: bool = False):
        cfg = self.config
        dtype = self._dtype()
        channels = cfg.channels

        x = x.astype(dtype)
        t_emb = TimeEmbedding(cfg.base_channels, cfg.time_embed_dim,
                              dtype=dtype, name="time_mlp")(timestep)

        h = QConv(channels[0], (3, 3), padding=PAD1, dtype=dtype,
                  act_quant=cfg.act_quant, name="init_conv")(x)

        # ------------------------------------------------------------------
        # Encoder (``efficient_unet.py:423-464,556-570``)
        # ------------------------------------------------------------------
        current_res = cfg.image_size
        skips: List[jnp.ndarray] = []
        for level, out_ch in enumerate(channels):
            for block_idx in range(cfg.num_res_blocks):
                h = self._irb(out_ch, f"enc_{level}_{block_idx}")(
                    h, t_emb, train)
                if current_res in cfg.attention_resolutions:
                    h = self._attention(f"enc_attn_{level}_{block_idx}")(
                        h, train)
            skips.append(h)
            if level < len(channels) - 1:
                h = Downsample(dtype=dtype, act_quant=cfg.act_quant,
                               name=f"down_{level}")(h)
                current_res //= 2

        # ------------------------------------------------------------------
        # Middle (``efficient_unet.py:466-480,572-575``)
        # ------------------------------------------------------------------
        h = self._irb(channels[-1], "mid_block1")(h, t_emb, train)
        h = self._attention("mid_attn")(h, train)
        h = self._irb(channels[-1], "mid_block2")(h, t_emb, train)

        # ------------------------------------------------------------------
        # Decoder (``efficient_unet.py:483-525,577-594``)
        # ------------------------------------------------------------------
        features: List[jnp.ndarray] = []
        for level, out_ch in enumerate(reversed(channels)):
            if level > 0:
                h = Upsample(dtype=dtype, act_quant=cfg.act_quant,
                             name=f"up_{level - 1}")(h)
            skip = skips.pop().astype(dtype)
            if not cfg.split_skip:
                h = jnp.concatenate([h, skip], axis=-1)
            for block_idx in range(cfg.num_res_blocks + 1):
                if cfg.split_skip and block_idx == 0:
                    # concat-free entry: the first block gets the skip
                    # SPLIT (InvertedResidualBlock.skip_input) so the
                    # level's largest tensor — the channel concat — is
                    # never materialized.
                    h = self._irb(out_ch, f"dec_{level}_0")(
                        h, t_emb, train, skip)
                else:
                    h = self._irb(out_ch, f"dec_{level}_{block_idx}")(
                        h, t_emb, train)
                if current_res in cfg.attention_resolutions:
                    h = self._attention(f"dec_attn_{level}_{block_idx}")(
                        h, train)
            if return_features:
                # per-decoder-level features (``efficient_unet.py:596-597``)
                features.append(h)
            if level < len(channels) - 1:
                current_res *= 2

        # Final head (``efficient_unet.py:528-530,599-602``)
        h = GroupNorm(name="final_norm")(h)
        h = jax.nn.silu(h)
        h = QConv(cfg.out_channels, (3, 3), padding=PAD1, dtype=dtype,
                  act_quant=cfg.act_quant, name="final_conv")(h)

        if return_features:
            return h, features
        return h


def create_efficient_unet(variant: str = "small", image_size: int = 256,
                          **kwargs) -> EfficientUNet:
    """Variant factory (``src/models/efficient_unet.py:631-692``).

    tiny / small / base / large presets; kwargs override any config field
    (e.g. ``in_channels=6`` for concat conditioning).
    """
    return EfficientUNet(unet_config(variant, image_size=image_size, **kwargs))


def init_unet(unet: EfficientUNet, rng: jax.Array,
              batch_size: int = 1):
    """Initialize parameters with a dummy batch."""
    cfg = unet.config
    x = jnp.zeros((batch_size, cfg.image_size, cfg.image_size,
                   cfg.in_channels), dtype=jnp.dtype(cfg.dtype))
    t = jnp.zeros((batch_size,), dtype=jnp.int32)
    return unet.init({"params": rng}, x, t)


def count_params(params) -> int:
    """Total parameter count (``efficient_unet.py:608-610``)."""
    return sum(p.size for p in jax.tree_util.tree_leaves(params))


def memory_footprint(params) -> dict:
    """fp32/bf16/int8 size estimates (``efficient_unet.py:612-628``;
    fp16 there ↦ bf16 here, the TPU half precision)."""
    n = count_params(params)
    return {
        "num_params": n,
        "fp32_mb": n * 4 / (1024 ** 2),
        "bf16_mb": n * 2 / (1024 ** 2),
        "int8_mb": n * 1 / (1024 ** 2),
    }
