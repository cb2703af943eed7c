"""Convert reference-PyTorch EfficientUNet weights to this framework's params.

Lets users of the reference project carry trained checkpoints over: a torch
``state_dict`` (NCHW, ``src/models/efficient_unet.py`` module names) becomes a
flax NHWC param tree for :class:`cv_diffusion_tpu.models.EfficientUNet`.

Layout rules:
  * conv weight  [O, I/g, kH, kW] → kernel [kH, kW, I/g, O]
  * linear weight [O, I]          → kernel [I, O]
  * 1×1-conv-as-Dense (SE fc1/fc2) → squeeze the spatial dims then transpose
  * GroupNorm weight/bias         → scale/bias

Module-name mapping is structural (encoder/decoder level + block index, with
attention blocks interleaved exactly as the reference's ModuleLists are
built, ``efficient_unet.py:429-525``).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..config import UNetConfig


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _dense(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (1, 0))


def _dense_from_1x1(w) -> np.ndarray:
    # [O, I, 1, 1] → [I, O]
    return np.transpose(np.asarray(w)[:, :, 0, 0], (1, 0))


def _gn(sd, prefix) -> Dict[str, np.ndarray]:
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _irb(sd, p: str) -> Dict[str, Any]:
    out: Dict[str, Any] = {
        "norm1": _gn(sd, f"{p}.norm1"),
        "expand": {"kernel": _conv(sd[f"{p}.expand.weight"])},
        "norm2_scale": np.asarray(sd[f"{p}.norm2.weight"]),
        "norm2_bias": np.asarray(sd[f"{p}.norm2.bias"]),
        "time_mlp": {"kernel": _dense(sd[f"{p}.time_mlp.1.weight"]),
                     "bias": np.asarray(sd[f"{p}.time_mlp.1.bias"])},
        "depthwise": {"kernel": _conv(sd[f"{p}.depthwise.weight"])},
        "project": {"kernel": _conv(sd[f"{p}.project.weight"])},
    }
    if f"{p}.se.fc1.weight" in sd:
        out["se"] = {
            "fc1": {"kernel": _dense_from_1x1(sd[f"{p}.se.fc1.weight"]),
                    "bias": np.asarray(sd[f"{p}.se.fc1.bias"])},
            "fc2": {"kernel": _dense_from_1x1(sd[f"{p}.se.fc2.weight"]),
                    "bias": np.asarray(sd[f"{p}.se.fc2.bias"])},
        }
    if f"{p}.skip.weight" in sd:
        out["skip"] = {"kernel": _conv(sd[f"{p}.skip.weight"])}
    return out


def _attention(sd, p: str, linear: bool) -> Dict[str, Any]:
    out: Dict[str, Any] = {
        "norm": _gn(sd, f"{p}.norm"),
        "to_qkv": {"kernel": _conv(sd[f"{p}.to_qkv.weight"])},
    }
    if linear:
        # to_out = Sequential(Conv, GroupNorm) (``efficient_unet.py:266-269``)
        out["to_out"] = {"kernel": _conv(sd[f"{p}.to_out.0.weight"])}
        out["out_norm"] = _gn(sd, f"{p}.to_out.1")
    else:
        out["to_out"] = {"kernel": _conv(sd[f"{p}.to_out.weight"])}
    return out


def _conv_inv(k) -> np.ndarray:
    # kernel [kH, kW, I/g, O] → torch conv weight [O, I/g, kH, kW]
    return np.transpose(np.asarray(k), (3, 2, 0, 1))


def _dense_inv(k) -> np.ndarray:
    return np.transpose(np.asarray(k), (1, 0))


def _1x1_from_dense(k) -> np.ndarray:
    # [I, O] → [O, I, 1, 1]
    return np.transpose(np.asarray(k), (1, 0))[:, :, None, None]


def _gn_inv(out, prefix: str, p: Dict[str, Any]) -> None:
    out[f"{prefix}.weight"] = np.asarray(p["scale"])
    out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _irb_inv(out, p: str, b: Dict[str, Any]) -> None:
    _gn_inv(out, f"{p}.norm1", b["norm1"])
    out[f"{p}.expand.weight"] = _conv_inv(b["expand"]["kernel"])
    out[f"{p}.norm2.weight"] = np.asarray(b["norm2_scale"])
    out[f"{p}.norm2.bias"] = np.asarray(b["norm2_bias"])
    out[f"{p}.time_mlp.1.weight"] = _dense_inv(b["time_mlp"]["kernel"])
    out[f"{p}.time_mlp.1.bias"] = np.asarray(b["time_mlp"]["bias"])
    out[f"{p}.depthwise.weight"] = _conv_inv(b["depthwise"]["kernel"])
    out[f"{p}.project.weight"] = _conv_inv(b["project"]["kernel"])
    if "se" in b:
        out[f"{p}.se.fc1.weight"] = _1x1_from_dense(b["se"]["fc1"]["kernel"])
        out[f"{p}.se.fc1.bias"] = np.asarray(b["se"]["fc1"]["bias"])
        out[f"{p}.se.fc2.weight"] = _1x1_from_dense(b["se"]["fc2"]["kernel"])
        out[f"{p}.se.fc2.bias"] = np.asarray(b["se"]["fc2"]["bias"])
    if "skip" in b:
        out[f"{p}.skip.weight"] = _conv_inv(b["skip"]["kernel"])


def _attention_inv(out, p: str, b: Dict[str, Any], linear: bool) -> None:
    _gn_inv(out, f"{p}.norm", b["norm"])
    out[f"{p}.to_qkv.weight"] = _conv_inv(b["to_qkv"]["kernel"])
    if linear:
        out[f"{p}.to_out.0.weight"] = _conv_inv(b["to_out"]["kernel"])
        _gn_inv(out, f"{p}.to_out.1", b["out_norm"])
    else:
        out[f"{p}.to_out.weight"] = _conv_inv(b["to_out"]["kernel"])


def export_unet_state_dict(params: Dict[str, Any],
                           config: UNetConfig) -> Dict[str, np.ndarray]:
    """flax params dict → reference-torch ``EfficientUNet.state_dict()``.

    Exact inverse of :func:`convert_unet_state_dict` — lets weights trained
    on TPU load into the reference implementation
    (``/root/reference/src/models/efficient_unet.py``) via
    ``model.load_state_dict({k: torch.tensor(v) for k, v in out.items()})``.
    Round-trip is bit-exact (values are only ever transposed/reshaped).
    """
    def _to_f32(tree):
        if isinstance(tree, dict):
            return {k: _to_f32(v) for k, v in tree.items()}
        return np.asarray(tree, dtype=np.float32)  # handles jax/bf16 leaves

    params = _to_f32(params)
    out: Dict[str, np.ndarray] = {}
    linear = config.use_linear_attention

    out["time_mlp.1.weight"] = _dense_inv(params["time_mlp"]["dense1"]["kernel"])
    out["time_mlp.1.bias"] = np.asarray(params["time_mlp"]["dense1"]["bias"])
    out["time_mlp.3.weight"] = _dense_inv(params["time_mlp"]["dense2"]["kernel"])
    out["time_mlp.3.bias"] = np.asarray(params["time_mlp"]["dense2"]["bias"])
    out["init_conv.weight"] = _conv_inv(params["init_conv"]["kernel"])
    out["init_conv.bias"] = np.asarray(params["init_conv"]["bias"])

    channels = config.channels
    current_res = config.image_size
    for level in range(len(channels)):
        attn_here = current_res in config.attention_resolutions
        idx = 0
        for block in range(config.num_res_blocks):
            _irb_inv(out, f"encoder_blocks.{level}.{idx}",
                     params[f"enc_{level}_{block}"])
            idx += 1
            if attn_here:
                _attention_inv(out, f"encoder_blocks.{level}.{idx}",
                               params[f"enc_attn_{level}_{block}"], linear)
                idx += 1
        if level < len(channels) - 1:
            out[f"downsamplers.{level}.down.weight"] = _conv_inv(
                params[f"down_{level}"]["conv"]["kernel"])
            out[f"downsamplers.{level}.down.bias"] = np.asarray(
                params[f"down_{level}"]["conv"]["bias"])
            current_res //= 2

    _irb_inv(out, "mid_block1", params["mid_block1"])
    _attention_inv(out, "mid_attn", params["mid_attn"], linear)
    _irb_inv(out, "mid_block2", params["mid_block2"])

    for level in range(len(channels)):
        attn_here = current_res in config.attention_resolutions
        idx = 0
        for block in range(config.num_res_blocks + 1):
            _irb_inv(out, f"decoder_blocks.{level}.{idx}",
                     params[f"dec_{level}_{block}"])
            idx += 1
            if attn_here:
                _attention_inv(out, f"decoder_blocks.{level}.{idx}",
                               params[f"dec_attn_{level}_{block}"], linear)
                idx += 1
        if level < len(channels) - 1:
            out[f"upsamplers.{level}.conv.weight"] = _conv_inv(
                params[f"up_{level}"]["conv"]["kernel"])
            out[f"upsamplers.{level}.conv.bias"] = np.asarray(
                params[f"up_{level}"]["conv"]["bias"])
            current_res *= 2

    _gn_inv(out, "final_norm", params["final_norm"])
    out["final_conv.weight"] = _conv_inv(params["final_conv"]["kernel"])
    out["final_conv.bias"] = np.asarray(params["final_conv"]["bias"])
    return out


def convert_condition_encoder_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """torch ``condition_encoder.*`` keys (the reference's add-mode
    nn.Sequential conv/SiLU/conv, ``low_light_diffusion.py:108-113``) →
    flax ``ConditionEncoder`` params (``models/diffusion.py``).

    ``sd`` is the FULL model state_dict; raises when no condition_encoder
    keys exist (i.e. a concat-mode checkpoint).
    """
    ce = {k[len("condition_encoder."):]:
          (v.detach().cpu().numpy() if hasattr(v, "detach") else
           np.asarray(v))
          for k, v in sd.items() if k.startswith("condition_encoder.")}
    if not ce:
        raise ValueError("state_dict has no condition_encoder.* keys "
                         "(concat-mode checkpoint?)")
    return {
        "conv1": {"kernel": _conv(ce["0.weight"]),
                  "bias": np.asarray(ce["0.bias"])},
        "conv2": {"kernel": _conv(ce["2.weight"]),
                  "bias": np.asarray(ce["2.bias"])},
    }


def convert_unet_state_dict(sd: Dict[str, Any],
                            config: UNetConfig) -> Dict[str, Any]:
    """torch ``EfficientUNet.state_dict()`` → flax params dict.

    ``sd`` values may be torch tensors or numpy arrays.
    """
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
              np.asarray(v)) for k, v in sd.items()}
    params: Dict[str, Any] = {}
    linear = config.use_linear_attention

    params["time_mlp"] = {
        "dense1": {"kernel": _dense(sd["time_mlp.1.weight"]),
                   "bias": np.asarray(sd["time_mlp.1.bias"])},
        "dense2": {"kernel": _dense(sd["time_mlp.3.weight"]),
                   "bias": np.asarray(sd["time_mlp.3.bias"])},
    }
    params["init_conv"] = {"kernel": _conv(sd["init_conv.weight"]),
                           "bias": np.asarray(sd["init_conv.bias"])}

    channels = config.channels
    # Encoder: ModuleList per level; attention interleaves after each IRB at
    # matching resolutions (``efficient_unet.py:429-457``).
    current_res = config.image_size
    for level in range(len(channels)):
        attn_here = current_res in config.attention_resolutions
        idx = 0
        for block in range(config.num_res_blocks):
            p = f"encoder_blocks.{level}.{idx}"
            params[f"enc_{level}_{block}"] = _irb(sd, p)
            idx += 1
            if attn_here:
                params[f"enc_attn_{level}_{block}"] = _attention(
                    sd, f"encoder_blocks.{level}.{idx}", linear)
                idx += 1
        if level < len(channels) - 1:
            params[f"down_{level}"] = {"conv": {
                "kernel": _conv(sd[f"downsamplers.{level}.down.weight"]),
                "bias": np.asarray(sd[f"downsamplers.{level}.down.bias"])}}
            current_res //= 2

    params["mid_block1"] = _irb(sd, "mid_block1")
    params["mid_attn"] = _attention(sd, "mid_attn", linear)
    params["mid_block2"] = _irb(sd, "mid_block2")

    for level in range(len(channels)):
        attn_here = current_res in config.attention_resolutions
        idx = 0
        for block in range(config.num_res_blocks + 1):
            p = f"decoder_blocks.{level}.{idx}"
            params[f"dec_{level}_{block}"] = _irb(sd, p)
            idx += 1
            if attn_here:
                params[f"dec_attn_{level}_{block}"] = _attention(
                    sd, f"decoder_blocks.{level}.{idx}", linear)
                idx += 1
        if level < len(channels) - 1:
            params[f"up_{level}"] = {"conv": {
                "kernel": _conv(sd[f"upsamplers.{level}.conv.weight"]),
                "bias": np.asarray(sd[f"upsamplers.{level}.conv.bias"])}}
            current_res *= 2

    params["final_norm"] = _gn(sd, "final_norm")
    params["final_conv"] = {"kernel": _conv(sd["final_conv.weight"]),
                            "bias": np.asarray(sd["final_conv.bias"])}
    return params
