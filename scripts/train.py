#!/usr/bin/env python
"""Training CLI.

Mirrors the reference ``scripts/train.py:35-160`` flag surface, plus a
``--config`` YAML that is actually parsed (the reference ships a YAML it never
loads) and TPU extras (--mesh, --no-warmup).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cv_diffusion_tpu.config import TrainConfig, load_yaml

# CLI flag → TrainConfig field; the value is computed from args in
# resolve_config (store_true flags invert to their config sense there).
_FLAG_TO_FIELD = {
    "variant": "unet_variant",
    "image_size": "image_size",
    "num_steps": "num_inference_steps",
    "epochs": "epochs",
    "batch_size": "batch_size",
    "lr": "learning_rate",
    "weight_decay": "weight_decay",
    "scheduler": "scheduler_type",
    "no_amp": "use_amp",
    "no_ema": "use_ema",
    "ema_decay": "ema_decay",
    "no_warmup": "faithful_no_warmup",
    "loss": "loss_type",
    "save_interval": "save_interval",
    "sample_interval": "sample_interval",
    "output_dir": "output_dir",
    "checkpoint_dir": "checkpoint_dir",
    "wandb": "use_wandb",
    "wandb_project": "wandb_project",
    "resume": "resume_from",
    "seed": "seed",
    "use_pallas": "use_pallas",
    "remat": "remat",
    "grad_accum": "grad_accum_steps",
    "data_on_device": "data_on_device",
    "qat": "qat",
    "qat_act": "qat_act",
    "prediction": "prediction_type",
    "init_params": "init_params_from",
    "init_ema": "init_params_ema",
    "sync_checkpoints": "async_checkpoints",
}


def resolve_config(args, argv):
    """(TrainConfig, data_dir, val_dir, use_synthetic) from parsed args.

    With --config, the YAML is the base and only flags EXPLICITLY present in
    ``argv`` override it (as the --config help text promises); flags left at
    their argparse defaults do not clobber YAML values.
    """
    import dataclasses

    def flag_value(flag):
        # --no_amp / --no_ema are disable-switches: invert to the config
        # sense (use_amp/use_ema). --no_warmup maps directly to
        # faithful_no_warmup.
        if flag == "no_amp":
            return not args.no_amp
        if flag == "no_ema":
            return not args.no_ema
        if flag == "sync_checkpoints":
            return not args.sync_checkpoints
        return getattr(args, flag)

    if args.config:
        exp = load_yaml(args.config)
        config = exp.train
        data_dir = exp.data.train_root
        val_dir = exp.data.val_root
        use_synth = exp.data.use_synthetic
        passed = {a.lstrip("-").split("=")[0] for a in argv
                  if a.startswith("--")}
        overrides = {field: flag_value(flag)
                     for flag, field in _FLAG_TO_FIELD.items()
                     if flag in passed}
        if overrides:
            config = dataclasses.replace(config, **overrides)
        if "data_dir" in passed:
            data_dir = args.data_dir
        if "val_dir" in passed:
            val_dir = (args.val_dir
                       if args.val_dir not in ("", "none", None) else None)
        if "use_synthetic" in passed:
            use_synth = args.use_synthetic
        return config, data_dir, val_dir, use_synth

    config = TrainConfig(
        **{field: flag_value(flag) for flag, field in _FLAG_TO_FIELD.items()})
    data_dir, use_synth = args.data_dir, args.use_synthetic
    # empty / "none" disables validation
    val_dir = args.val_dir if args.val_dir not in ("", "none", None) else None
    return config, data_dir, val_dir, use_synth


def build_parser():
    # allow_abbrev=False: resolve_config detects explicitly-passed flags by
    # matching argv tokens, so an abbreviation like --epoch would parse but
    # silently fail to override the YAML.
    p = argparse.ArgumentParser(description="Train low-light diffusion (TPU)",
                                allow_abbrev=False)
    # Data
    p.add_argument("--data_dir", type=str, default="data/our485",
                   help="Training data directory (root/{low,high}/)")
    p.add_argument("--val_dir", type=str, default="data/eval15",
                   help="Validation data directory")
    p.add_argument("--use_synthetic", action="store_true",
                   help="Synthesize low-light inputs from normal images")
    # Model
    p.add_argument("--variant", type=str, default="small",
                   choices=["tiny", "small", "base", "large"])
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--num_steps", type=int, default=4,
                   help="LCM inference steps")
    # Training
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--loss", type=str, default="mse",
                   choices=["mse", "huber", "l1"])
    p.add_argument("--scheduler", type=str, default="cosine",
                   choices=["cosine", "onecycle"])
    p.add_argument("--no_amp", action="store_true",
                   help="Disable bf16 mixed precision")
    p.add_argument("--no_ema", action="store_true")
    p.add_argument("--ema_decay", type=float, default=0.9999)
    p.add_argument("--no_warmup", action="store_true",
                   help="Reference-faithful: cosine from step 0, no warmup")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--use_pallas", action="store_true",
                   help="Pallas linear-attention kernel in the train step "
                        "(custom VJP: Pallas forward, analytic XLA backward)")
    p.add_argument("--remat", action="store_true",
                   help="Rematerialize IRB/attention blocks in the backward "
                        "pass (jax.checkpoint): fits larger batches in HBM "
                        "at a recompute-FLOPs cost")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="Micro-batches per optimizer update (lax.scan "
                        "inside the jitted step); batch_size must divide "
                        "evenly. 1 = off")
    p.add_argument("--data_on_device", action="store_true",
                   help="Cache the decoded training set in device HBM "
                        "(uint8) and augment on device — for HBM-sized "
                        "datasets on decode/upload-bound hosts")
    # Logging / checkpointing
    p.add_argument("--output_dir", type=str, default="outputs")
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints")
    p.add_argument("--save_interval", type=int, default=5)
    p.add_argument("--sync_checkpoints", action="store_true",
                   help="Save checkpoints synchronously on the main thread "
                        "(default: async — on-device snapshot, then "
                        "fetch+write on a worker thread)")
    p.add_argument("--sample_interval", type=int, default=1)
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--wandb_project", type=str,
                   default="low-light-diffusion-tpu")
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--prediction", type=str, default="epsilon",
                   choices=("epsilon", "v_prediction"),
                   help="UNet prediction target (v_prediction: velocity — "
                        "better-conditioned near the zero-terminal-SNR "
                        "endpoint)")
    p.add_argument("--qat", action="store_true",
                   help="Quantization-aware training: fake-quantize weights "
                        "in the forward pass (int8 STE, same scale/skip "
                        "rules as the int8 export) — fine-tune before an "
                        "int8 serving export")
    p.add_argument("--qat_act", action="store_true",
                   help="Activation-aware QAT: ALSO fake-quantize QConv "
                        "inputs (STE, int8-path scale rules) — targets the "
                        "int8_act SSIM cliff that weight-only QAT cannot "
                        "touch (BENCHMARKS §QAT); implies --qat")
    p.add_argument("--init_params", type=str, default=None,
                   help="Warm-start params (+EMA) from a checkpoint with a "
                        "FRESH optimizer/epoch (fine-tuning; unlike "
                        "--resume)")
    p.add_argument("--init_ema", action="store_true",
                   help="With --init_params: start from the checkpoint's "
                        "EMA (deployed) weights")
    p.add_argument("--distributed", action="store_true",
                   help="Multi-host: jax.distributed.initialize from "
                        "CVDM_COORDINATOR/CVDM_NUM_PROCESSES/CVDM_PROCESS_ID "
                        "(or TPU-pod auto-detect)")
    # Config file (actually parsed, unlike the reference)
    p.add_argument("--config", type=str, default=None,
                   help="YAML config; CLI flags override")
    return p


def main():
    from cv_diffusion_tpu.utils.compile_opts import (
        maybe_enable_compilation_cache)
    maybe_enable_compilation_cache()  # CVDM_COMPILE_CACHE=<dir>
    args = build_parser().parse_args()

    config, data_dir, val_dir, use_synth = resolve_config(args, sys.argv[1:])

    if args.distributed:
        from cv_diffusion_tpu.parallel import distributed_init
        distributed_init()

    from cv_diffusion_tpu.training import train_model
    train_model(data_dir, val_dir, config, use_synthetic=use_synth)


if __name__ == "__main__":
    main()
