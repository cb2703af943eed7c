#!/usr/bin/env python
"""LCM consistency-distillation CLI.

Teacher checkpoint → distilled student package.  The reference ships the
distillation components unwired (``src/models/low_light_diffusion.py:284-408``,
SURVEY §2); this makes them a first-class training mode.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    from cv_diffusion_tpu.utils.compile_opts import (
        maybe_enable_compilation_cache)
    maybe_enable_compilation_cache()  # CVDM_COMPILE_CACHE=<dir>
    p = argparse.ArgumentParser(description="LCM consistency distillation")
    p.add_argument("--teacher", type=str, required=True,
                   help="Teacher checkpoint dir (orbax)")
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--val_dir", type=str, default=None)
    p.add_argument("--use_synthetic", action="store_true")
    p.add_argument("--variant", type=str, default="small",
                   help="STUDENT architecture variant")
    p.add_argument("--teacher_variant", type=str, default=None,
                   help="teacher architecture when it differs from the "
                        "student (regression mode only); default: "
                        "auto-detect from the teacher artifact, falling "
                        "back to --variant")
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--num_steps", type=int, default=4,
                   help="Target LCM inference steps for the student")
    p.add_argument("--num_ddim_timesteps", type=int, default=50)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--ema_decay", type=float, default=0.95,
                   help="Distillation EMA (reference default 0.95)")
    p.add_argument("--init_student", type=str, default=None,
                   help="Warm-start the student (and its EMA copy) from an "
                        "existing student checkpoint / params dir instead of "
                        "the teacher — continue or stage a distillation run")
    p.add_argument("--teacher_ema", action="store_true",
                   help="Use the teacher checkpoint's EMA weights (only "
                        "sensible when the teacher trained long enough for "
                        "EMA to converge: ~3/decay-complement steps)")
    p.add_argument("--canonical", action="store_true",
                   help="Canonical LCM timestep direction (EMA target one "
                        "teacher DDIM step closer to data) instead of the "
                        "reference's inverted pairing")
    p.add_argument("--pair_stride", type=int, default=None,
                   help="DDIM grid points per teacher step in --canonical "
                        "mode (default: the reference's N/num_steps skip; "
                        "1 = adjacent-point consistency distillation)")
    p.add_argument("--sampler_matched", action="store_true",
                   help="Distill over the deployed k-step LCM sampler's own "
                        "grid and stochastic renoise transitions instead of "
                        "DDIM trajectories")
    p.add_argument("--regression", action="store_true",
                   help="Sampler-to-sampler regression distillation: the "
                        "student's FULL m-step sampler output (its own "
                        "--student_timesteps grid) regresses onto the frozen "
                        "teacher's full --teacher_steps sampler output. The "
                        "1-step-student mode — the stock 1-step grid [19] is "
                        "degenerate by construction (8.9 dB measured)")
    p.add_argument("--student_timesteps", type=str, default="739",
                   help="Comma-separated descending student grid for "
                        "--regression (default '739': one high-t step)")
    p.add_argument("--teacher_steps", type=int, default=None,
                   help="Teacher sampler steps for --regression "
                        "(default: --num_steps)")
    p.add_argument("--deterministic_teacher", action="store_true",
                   help="Use the renoise-free DDIM-style teacher sampler as "
                        "the regression target")
    p.add_argument("--regression_full_grad", action="store_true",
                   help="With --regression and a multi-step grid: backprop "
                        "through ALL student steps instead of the default "
                        "final-step-only (stop-grad prefix). Needs ~m x the "
                        "HBM: a 2-step small@256 full-grad backward is "
                        "42 GiB at b16 / 28 GiB at b4 vs the 15.75 GiB chip")
    p.add_argument("--gt_weight", type=float, default=0.0,
                   help="Mix a ground-truth huber anchor into the "
                        "regression loss: (1-w)*teacher + w*gt")
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints")
    p.add_argument("--output_dir", type=str, default="outputs")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", type=str, default="float32",
                   choices=("float32", "bfloat16"),
                   help="Compute dtype for the distillation forwards. "
                        "float32 (default) matches the round-3 runs; "
                        "bfloat16 trains the student in the SERVING dtype "
                        "(a student validated in f32 can lose ~0.8 dB when "
                        "sampled in bf16 — measured round 4)")
    p.add_argument("--use_pallas", action="store_true",
                   help="Pallas linear-attention kernel for the teacher/"
                        "student/EMA forwards (custom VJP covers the "
                        "student's backward)")
    p.add_argument("--remat", action="store_true",
                   help="Rematerialize blocks in the student's backward "
                        "pass (jax.checkpoint) — fits larger batches")
    p.add_argument("--data_on_device", action="store_true",
                   help="Cache the decoded training set in device HBM "
                        "(uint8) and augment on device — for HBM-sized "
                        "datasets on decode/upload-bound hosts")
    args = p.parse_args()

    if not (args.canonical or args.sampler_matched or args.regression):
        print(
            "WARNING: running with the reference-faithful timestep pairing "
            "(EMA target at the MORE-noised point, "
            "low_light_diffusion.py:344-351). Measured on-chip, this "
            "pairing collapses the student (19.3 -> 5.1 dB PSNR, "
            "BENCHMARKS.md quality gate) because the consistency recursion "
            "has no anchor at the data end. Pass --canonical or "
            "--sampler_matched for a properly anchored variant.",
            file=sys.stderr)

    import jax
    from cv_diffusion_tpu.config import TrainConfig, diffusion_config
    from cv_diffusion_tpu.data import create_dataloaders
    from cv_diffusion_tpu.models import create_model, init_model
    from cv_diffusion_tpu.training import DistillationTrainer
    from cv_diffusion_tpu.training import checkpoint as ckpt

    # a v-prediction teacher distilled under an epsilon schedule silently
    # produces garbage — detect the teacher's trained target (the student
    # inherits it; its saved model_config.json propagates it downstream)
    pred_type = ckpt.load_prediction_type(args.teacher) or "epsilon"
    if pred_type != "epsilon":
        print(f"Prediction type: {pred_type} (auto-detected from teacher)")
    model_cfg = diffusion_config(args.variant, image_size=args.image_size,
                                 num_inference_steps=args.num_steps,
                                 dtype=args.dtype,
                                 prediction_type=pred_type,
                                 use_pallas=args.use_pallas,
                                 remat=args.remat)
    model, schedule = create_model(model_cfg)

    # Capacity-asymmetric distillation: teacher arch may differ from the
    # student's (regression mode regresses sampler outputs, so nothing ties
    # the architectures together).  Auto-detect from the teacher artifact.
    teacher_variant = (args.teacher_variant
                       or ckpt.detect_variant(args.teacher) or args.variant)
    teacher_model = None
    teacher_net = model
    if teacher_variant != args.variant:
        print(f"Teacher variant: {teacher_variant} (student: {args.variant})")
        teacher_cfg = diffusion_config(
            teacher_variant, image_size=args.image_size,
            num_inference_steps=args.num_steps, dtype=args.dtype,
            prediction_type=pred_type, use_pallas=args.use_pallas,
            remat=args.remat)
        teacher_model, _ = create_model(teacher_cfg)
        teacher_net = teacher_model
    like = jax.eval_shape(lambda k: init_model(teacher_net, k),
                          jax.random.key(0))
    like = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), like)["params"]
    teacher = ckpt.load_inference_params(args.teacher, like,
                                         use_ema=args.teacher_ema)
    student = None
    if args.init_student is not None:
        student_like = like
        if teacher_model is not None:  # student arch differs from teacher's
            student_like = jax.eval_shape(lambda k: init_model(model, k),
                                          jax.random.key(0))
            student_like = jax.tree_util.tree_map(
                lambda s: np.zeros(s.shape, s.dtype), student_like)["params"]
        student = ckpt.load_inference_params(args.init_student, student_like)

    train_loader, val_loader = create_dataloaders(
        args.data_dir, args.val_dir, batch_size=args.batch_size,
        image_size=args.image_size, use_synthetic=args.use_synthetic,
        seed=args.seed, device_cache=args.data_on_device)

    cfg = TrainConfig(unet_variant=args.variant, image_size=args.image_size,
                      num_inference_steps=args.num_steps, epochs=args.epochs,
                      batch_size=args.batch_size, learning_rate=args.lr,
                      checkpoint_dir=args.checkpoint_dir,
                      output_dir=args.output_dir, seed=args.seed)
    student_ts = None
    if args.regression:
        student_ts = tuple(
            int(t) for t in args.student_timesteps.split(",") if t.strip())
    trainer = DistillationTrainer(
        model, schedule, teacher, train_loader, val_loader, cfg,
        num_ddim_timesteps=args.num_ddim_timesteps, ema_decay=args.ema_decay,
        canonical=args.canonical, pair_stride=args.pair_stride,
        sampler_matched=args.sampler_matched, student_params=student,
        regression=args.regression, student_timesteps=student_ts,
        teacher_steps=args.teacher_steps,
        deterministic_teacher=args.deterministic_teacher,
        gt_weight=args.gt_weight, full_grad=args.regression_full_grad,
        teacher_model=teacher_model)
    trainer.train()


if __name__ == "__main__":
    main()
