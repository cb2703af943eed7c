"""Unified configuration system.

The reference scatters configuration across four disconnected dataclasses,
per-script argparse flags, and a ``configs/default.yaml`` that is never parsed
(reference ``configs/default.yaml:1-107``; see also
``src/models/efficient_unet.py:24-57``, ``src/training/trainer.py:36-83``).
Here everything lives in one tree of frozen (hashable, jit-static-friendly)
dataclasses with a YAML loader that is actually wired into the CLIs.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


def _freeze(value):
    if isinstance(value, list):
        return tuple(_freeze(v) for v in value)
    return value


@dataclass(frozen=True)
class UNetConfig:
    """Architecture hyperparameters.

    Field-for-field equivalent of the reference ``EfficientUNetConfig``
    (``src/models/efficient_unet.py:24-57``), NHWC / TPU-first semantics.
    """

    in_channels: int = 3
    out_channels: int = 3

    base_channels: int = 32
    channel_multipliers: Tuple[int, ...] = (1, 2, 4, 8)

    attention_resolutions: Tuple[int, ...] = (16, 8)
    num_attention_heads: int = 4
    attention_head_dim: int = 32
    use_linear_attention: bool = True

    num_res_blocks: int = 2
    expansion_ratio: int = 4
    use_se: bool = True
    se_ratio: float = 0.25

    time_embed_dim: int = 128

    dropout: float = 0.0
    quantization_friendly: bool = True
    image_size: int = 256

    # TPU-specific knobs (no reference equivalent):
    #   dtype: compute dtype for activations; params stay float32.
    #   use_pallas: route linear attention / fused norm through Pallas kernels.
    #   act_quant: int8 activation×weight conv compute (serving; the executed
    #     int8 path — reference ``src/export/quantization.py:144-271``).
    dtype: str = "float32"
    use_pallas: bool = False
    #   use_pallas_irb: inference-time fused IRB Pallas kernel (one HBM read
    #     of x + one write of out per block instead of XLA's hidden-tensor
    #     round trips). Training and init always use the XLA path.
    use_pallas_irb: bool = False
    #   fold_gn: graph-level inference fold of GN2⊕FiLM into the expand-conv
    #     epilogue via the augmented-Gram identity (ops/norms.
    #     gn2_film_affine_gram) — removes the h1 HBM round trips without a
    #     custom kernel. Training and init always use the two-pass path.
    fold_gn: bool = False
    #   split_skip: decoder graph rewrite — the first block per level
    #     consumes (upsampled, skip) SPLIT instead of materializing their
    #     channel concat (conv(concat(u,s)) ≡ conv_u(u)+conv_s(s); GN stats
    #     combine from per-part partial sums). Pure rewrite: identical
    #     params, init always concatenates. See BENCHMARKS.md §concat-split.
    split_skip: bool = False
    #   act_quant: False = float; True = int8 serving compute; "fake" =
    #     activation-aware QAT (STE quantize→dequantize of activations in
    #     the forward — ops/qconv.QConv._fake_quant_conv).
    act_quant: Any = False
    #   remat: rematerialize every IRB / attention block under autodiff
    #     (jax.checkpoint via nn.remat) — trades recompute FLOPs for
    #     activation HBM so bigger train batches fit (SURVEY §7 "remat to
    #     trade FLOPs for memory"; the reference has no equivalent — torch
    #     would need explicit checkpoint_sequential). Forward-only graphs
    #     are unaffected (checkpoint is an autodiff-time construct).
    remat: bool = False
    #   remat_policy: what the checkpointed blocks SAVE.
    #     "full" — save nothing (classic remat: max memory saving, max
    #       recompute; measured 0.90x throughput at small@256 b32).
    #     "conv" — save every QConv output (tagged via
    #       jax.ad_checkpoint.checkpoint_name) and recompute only the
    #       elementwise work between convs (GN stats/normalize, act, FiLM,
    #       SE gating) in the backward — a TRAFFIC cut, not just a memory
    #       cut: the cheap wide intermediates never round-trip HBM, while
    #       the MXU outputs are never recomputed. See BENCHMARKS.md §remat.
    remat_policy: str = "full"
    #   remat_scope: which blocks are rematerialized. "all", or "decoder"
    #     (mid + decoder only — the widest activations live there; the
    #     encoder's are comparatively cheap to keep).
    remat_scope: str = "all"

    @property
    def channels(self) -> Tuple[int, ...]:
        return tuple(self.base_channels * m for m in self.channel_multipliers)

    def resolutions(self) -> Tuple[int, ...]:
        """Feature-map resolution at each UNet level (pre-downsample)."""
        res = []
        r = self.image_size
        for _ in self.channel_multipliers:
            res.append(r)
            r //= 2
        return tuple(res)


# Variant presets mirror the reference factory
# (``src/models/efficient_unet.py:631-692``): tiny ~1M, small ~3M, base ~5M,
# large ~10M parameters.
UNET_VARIANTS: Dict[str, Dict[str, Any]] = {
    "tiny": dict(base_channels=16, channel_multipliers=(1, 2, 4, 8),
                 num_res_blocks=1, expansion_ratio=2, time_embed_dim=64,
                 num_attention_heads=2),
    "small": dict(base_channels=32, channel_multipliers=(1, 2, 4, 8),
                  num_res_blocks=2, expansion_ratio=4, time_embed_dim=128,
                  num_attention_heads=4),
    "base": dict(base_channels=48, channel_multipliers=(1, 2, 4, 8),
                 num_res_blocks=2, expansion_ratio=4, time_embed_dim=192,
                 num_attention_heads=6),
    "large": dict(base_channels=64, channel_multipliers=(1, 2, 4, 8),
                  num_res_blocks=3, expansion_ratio=4, time_embed_dim=256,
                  num_attention_heads=8),
}


def variant_of(unet_cfg: Dict[str, Any]) -> Optional[str]:
    """Reverse lookup: name of the variant preset matching a (possibly
    partial) UNet-config dict, or None.  Lets CLIs auto-detect the
    architecture from an artifact's recorded ``model_config.json`` instead
    of requiring a matching ``--variant`` by hand."""
    def _norm(v):
        return tuple(v) if isinstance(v, list) else v

    for name, kwargs in UNET_VARIANTS.items():
        if all(_norm(unet_cfg.get(k)) == _norm(v) for k, v in kwargs.items()):
            return name
    return None


def unet_config(variant: str = "small", image_size: int = 256, **overrides) -> UNetConfig:
    """Build a UNetConfig from a named variant.

    Equivalent of the reference ``create_efficient_unet``
    (``src/models/efficient_unet.py:631-692``) minus the module instantiation.
    """
    if variant not in UNET_VARIANTS:
        raise ValueError(
            f"Unknown variant: {variant}. Choose from {sorted(UNET_VARIANTS)}")
    kwargs: Dict[str, Any] = dict(UNET_VARIANTS[variant])
    kwargs["image_size"] = image_size
    kwargs.update(overrides)
    return UNetConfig(**kwargs)


@dataclass(frozen=True)
class SchedulerConfig:
    """LCM scheduler configuration.

    Mirrors the reference ``LCMScheduler.__init__`` registration
    (``src/models/lcm_scheduler.py:53-66``).
    """

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"  # linear | scaled_linear | squaredcos_cap_v2
    prediction_type: str = "epsilon"       # epsilon | v_prediction
    rescale_betas_zero_snr: bool = False
    num_inference_steps: int = 4
    original_inference_steps: int = 50
    # Deployment-path parity knob: the reference's NumPy loop clips the x0
    # prediction to [-1, 1] (``src/export/android_pipeline.py:267``) while the
    # torch scheduler does not (``src/models/lcm_scheduler.py:224-225``).  One
    # implementation here; the flag selects which behavior.
    clip_pred_x0: bool = False


@dataclass(frozen=True)
class DiffusionConfig:
    """Top-level conditional-diffusion model configuration.

    Mirrors the reference ``LowLightDiffusion.__init__`` arguments
    (``src/models/low_light_diffusion.py:50-113``).
    """

    unet: UNetConfig = field(default_factory=UNetConfig)
    scheduler: SchedulerConfig = field(
        default_factory=lambda: SchedulerConfig(rescale_betas_zero_snr=True))
    image_size: int = 256
    num_inference_steps: int = 4
    condition_mode: str = "concat"  # concat | add


def diffusion_config(unet_variant: str = "small", image_size: int = 256,
                     num_inference_steps: int = 4,
                     condition_mode: str = "concat",
                     prediction_type: str = "epsilon",
                     **unet_overrides) -> DiffusionConfig:
    in_channels = 6 if condition_mode == "concat" else 3
    return DiffusionConfig(
        unet=unet_config(unet_variant, image_size=image_size,
                         in_channels=in_channels, **unet_overrides),
        scheduler=SchedulerConfig(rescale_betas_zero_snr=True,
                                  prediction_type=prediction_type),
        image_size=image_size,
        num_inference_steps=num_inference_steps,
        condition_mode=condition_mode,
    )


@dataclass(frozen=True)
class DataConfig:
    """Dataset / input-pipeline configuration
    (reference ``src/training/dataset.py:41-60,335-355``)."""

    train_root: str = "data/our485"
    val_root: Optional[str] = "data/eval15"
    low_dir: str = "low"
    high_dir: str = "high"
    image_size: int = 256
    batch_size: int = 8
    augment: bool = True
    paired: bool = True
    use_synthetic: bool = False
    shuffle_seed: int = 0
    # Synthetic degradation knobs (``src/training/dataset.py:256-258``).
    gamma_range: Tuple[float, float] = (2.0, 5.0)
    noise_level_range: Tuple[float, float] = (0.01, 0.05)


@dataclass(frozen=True)
class TrainConfig:
    """Training configuration (reference ``TrainingConfig``,
    ``src/training/trainer.py:36-83``)."""

    unet_variant: str = "small"
    image_size: int = 256
    num_inference_steps: int = 4

    epochs: int = 100
    batch_size: int = 8
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    gradient_clip: float = 1.0

    scheduler_type: str = "cosine"  # cosine | onecycle
    warmup_epochs: int = 5
    min_lr: float = 1e-6
    # The reference computes warmup steps but never applies warmup
    # (``src/training/trainer.py:159-168``).  We default to a real warmup and
    # keep `faithful_no_warmup` to replicate the reference behavior exactly.
    faithful_no_warmup: bool = False

    # bf16 compute replaces CUDA AMP (``src/training/trainer.py:177-184``).
    use_amp: bool = True

    use_ema: bool = True
    ema_decay: float = 0.9999
    # min(ema_decay, (1+t)/(10+t)) warmup — makes EMA usable in short runs;
    # False = reference-faithful fixed decay (``src/training/trainer.py:98``).
    ema_warmup: bool = True

    loss_type: str = "mse"  # mse | huber | l1

    log_interval: int = 100
    save_interval: int = 5
    sample_interval: int = 1
    num_samples: int = 4
    # Overlap checkpoint saves with training (checkpoint.AsyncCheckpointSaver:
    # on-device snapshot, then fetch+write on a worker thread). On the axon
    # tunnel a synchronous full-state save stalls the loop ~20-30 s.
    # Single-process only; multi-host saves stay collective on-thread.
    async_checkpoints: bool = True

    output_dir: str = "outputs"
    checkpoint_dir: str = "checkpoints"

    use_wandb: bool = False
    wandb_project: str = "low-light-diffusion-tpu"
    wandb_run_name: Optional[str] = None

    resume_from: Optional[str] = None

    seed: int = 0
    # Data pipeline: None = auto-select the native C++ loader when built
    # (the reference's num_workers pipeline equivalent,
    # ``src/training/dataset.py:371-378``); True forces it, False forces the
    # pure-Python loader.  prefetch_batches overlaps host batch assembly
    # with the device step.
    native_loader: Optional[bool] = None
    prefetch_batches: int = 2
    # Cache the decoded training set in device HBM (uint8) and assemble/
    # augment batches on device (data/device_cache.py). For HBM-sized
    # datasets on hosts where decode or upload bandwidth bounds training;
    # per-step host->device traffic drops to an index vector.
    data_on_device: bool = False
    # Debugging: raise on NaN/Inf anywhere in the computation (the JAX
    # equivalent of a sanitizer pass; SURVEY §5 — the reference has none).
    debug_nans: bool = False
    # Route linear attention through the Pallas kernel during training (it
    # carries a custom VJP: Pallas forward + analytic XLA backward). Off by
    # default: the on-chip train-step A/B measured 0.94x at small@128 b64
    # (306 -> 289 img/s; XLA's autodiff fuses the attention backward with
    # its saved residuals better than the recompute-from-q/k/v VJP) and a
    # noise-level 1.02x at small@256 b32 (mid-attention only). Serving and
    # every forward-only surface default the kernel ON (+3.9%, no VJP cost).
    use_pallas: bool = False
    # Rematerialize blocks under autodiff (UNetConfig.remat): recompute
    # IRB/attention internals in the backward pass instead of storing them.
    # Measured on-chip (BENCHMARKS.md §remat): on this backend remat RAISES
    # peak HBM (XLA memory-space-assignment prefetch copies around
    # checkpoint regions) — every remat config at batch >= 64 OOMs where
    # the plain step fits, and it costs 9-13% where it runs. Use
    # grad_accum_steps for big effective batches instead (faster AND
    # smaller); remat stays available for future backends/models.
    remat: bool = False
    # Gradient accumulation: split each logical batch into this many
    # micro-batches inside the jitted step (lax.scan), averaging the grads
    # before one optimizer update. HBM holds one micro-batch of activations
    # at a time, so batch_size can exceed what fits directly — AND it is
    # measured FASTER than the plain step (amortizes optimizer+EMA+dispatch
    # overhead): effective b256 as 8x32 micro-batches = 102.1 img/s vs
    # 90-93 plain b32 on-chip (BENCHMARKS.md §remat). 1 = off. batch_size
    # must be divisible by grad_accum_steps.
    grad_accum_steps: int = 1
    # Parallelism: mesh shape, e.g. (8,) pure-DP or (4, 2) data×spatial
    # (None = auto: largest DP mesh the batch divides). mesh_axes=None
    # derives names from the shape's rank (('data',) / ('data','spatial')).
    mesh_shape: Optional[Tuple[int, ...]] = None
    mesh_axes: Optional[Tuple[str, ...]] = None
    # Quantization-aware training: the jitted step fake-quantizes weights
    # (int8 symmetric, STE backward — export/qat.py) with the SAME
    # scale/skip rules the post-training int8 export applies, so trained
    # weights land on representable grid points. The reference declares QAT
    # but never invokes it (``src/export/quantization.py:274-311``).
    qat: bool = False
    # Activation-aware QAT: additionally fake-quantize ACTIVATIONS at every
    # QConv (STE, int8-path scale rules — ``ops/qconv.py``).  Weight-only
    # QAT measured as a wash on int8_act's SSIM cliff (BENCHMARKS §QAT:
    # the −0.18 SSIM vs bf16 is activation noise); this is the named fix.
    # Implies ``qat`` (weights still fake-quantize via params_transform).
    qat_act: bool = False
    # Warm-start params (and EMA) from an existing checkpoint WITHOUT
    # restoring optimizer state or epoch — the fine-tuning entry (QAT
    # fine-tune of a trained model, staged training). Unlike resume_from,
    # training starts at epoch 0 with a fresh optimizer/LR schedule.
    init_params_from: Optional[str] = None
    # Load the checkpoint's EMA weights (the deployed ones) as the starting
    # params when warm-starting.
    init_params_ema: bool = False
    # What the UNet predicts: "epsilon" (reference default) or
    # "v_prediction" (velocity — better-conditioned targets near the
    # zero-terminal-SNR endpoint; the reference defines get_velocity but
    # never trains with it, ``src/models/lcm_scheduler.py:227-244``).
    prediction_type: str = "epsilon"


@dataclass(frozen=True)
class ExperimentConfig:
    """Everything needed for one run: model + scheduler + data + training."""

    model: DiffusionConfig = field(default_factory=DiffusionConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)


# ---------------------------------------------------------------------------
# Serialization helpers (to/from dict, YAML, JSON)
# ---------------------------------------------------------------------------

def to_dict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def _build(cls, data: Dict[str, Any]):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        value = data[f.name]
        if dataclasses.is_dataclass(f.type) if isinstance(f.type, type) else False:
            kwargs[f.name] = _build(f.type, value)
        else:
            kwargs[f.name] = _freeze(value)
    return cls(**kwargs)


_NESTED = {
    "unet": UNetConfig,
    "scheduler": SchedulerConfig,
    "model": DiffusionConfig,
    "data": DataConfig,
    "train": TrainConfig,
}


def from_dict(cls, data: Dict[str, Any]):
    """Reconstruct a (possibly nested) config dataclass from a plain dict."""
    kwargs: Dict[str, Any] = {}
    names = {f.name for f in dataclasses.fields(cls)}
    for key, value in data.items():
        if key not in names:
            continue
        if key in _NESTED and isinstance(value, dict):
            kwargs[key] = from_dict(_NESTED[key], value)
        else:
            kwargs[key] = _freeze(value)
    return cls(**kwargs)


def load_yaml(path: str) -> ExperimentConfig:
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f) or {}
    return from_dict(ExperimentConfig, data)


def save_yaml(cfg, path: str) -> None:
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(to_dict(cfg), f, sort_keys=False)


def to_json(cfg) -> str:
    return json.dumps(to_dict(cfg), indent=2)


def from_json(cls, text: str):
    return from_dict(cls, json.loads(text))
