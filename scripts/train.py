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


def main():
    p = argparse.ArgumentParser(description="Train low-light diffusion (TPU)")
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
    # Logging / checkpointing
    p.add_argument("--output_dir", type=str, default="outputs")
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints")
    p.add_argument("--save_interval", type=int, default=5)
    p.add_argument("--sample_interval", type=int, default=1)
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--wandb_project", type=str,
                   default="low-light-diffusion-tpu")
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--distributed", action="store_true",
                   help="Multi-host: jax.distributed.initialize from "
                        "CVDM_COORDINATOR/CVDM_NUM_PROCESSES/CVDM_PROCESS_ID "
                        "(or TPU-pod auto-detect)")
    # Config file (actually parsed, unlike the reference)
    p.add_argument("--config", type=str, default=None,
                   help="YAML config; CLI flags override")
    args = p.parse_args()

    if args.config:
        exp = load_yaml(args.config)
        config = exp.train
        data_dir = exp.data.train_root
        val_dir = exp.data.val_root
        use_synth = exp.data.use_synthetic
    else:
        config = TrainConfig(
            unet_variant=args.variant,
            image_size=args.image_size,
            num_inference_steps=args.num_steps,
            epochs=args.epochs,
            batch_size=args.batch_size,
            learning_rate=args.lr,
            weight_decay=args.weight_decay,
            scheduler_type=args.scheduler,
            use_amp=not args.no_amp,
            use_ema=not args.no_ema,
            ema_decay=args.ema_decay,
            faithful_no_warmup=args.no_warmup,
            loss_type=args.loss,
            save_interval=args.save_interval,
            sample_interval=args.sample_interval,
            output_dir=args.output_dir,
            checkpoint_dir=args.checkpoint_dir,
            use_wandb=args.wandb,
            wandb_project=args.wandb_project,
            resume_from=args.resume,
            seed=args.seed,
        )
        data_dir, use_synth = args.data_dir, args.use_synthetic
        # empty / "none" disables validation
        val_dir = args.val_dir if args.val_dir not in ("", "none", None) else None

    if args.distributed:
        from cv_diffusion_tpu.parallel import distributed_init
        distributed_init()

    from cv_diffusion_tpu.training import train_model
    train_model(data_dir, val_dir, config, use_synthetic=use_synth)


if __name__ == "__main__":
    main()
