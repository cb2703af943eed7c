#!/usr/bin/env python
"""Inference CLI: enhance a single image or a folder.

Mirrors the reference ``scripts/inference.py:30-281``: checkpoint or serving
package in, PNG(s) out, per-image timing and folder FPS summary.  Backends:
  * ``checkpoint`` — orbax training checkpoint (params [+ EMA]);
  * ``package``    — serving package from scripts/export.py.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from PIL import Image


def parse_timesteps(model_path, timesteps_arg):
    """--timesteps grid, or the grid a regression-distilled student recorded
    next to its checkpoint (student_timesteps.json) — serving such a student
    on the stock grid would be wrong (its 1-step grid is e.g. [739])."""
    if timesteps_arg:
        return tuple(int(t) for t in timesteps_arg.split(",") if t.strip())
    import json
    marker = Path(model_path) / "student_timesteps.json"
    if marker.exists():
        with open(marker) as f:
            ts = tuple(json.load(f)["timesteps"])
        print(f"Using recorded student timestep grid: {list(ts)}")
        return ts
    # serving packages record the grid in model_config.json
    pkg_cfg = Path(model_path) / "model_config.json"
    if pkg_cfg.exists():
        with open(pkg_cfg) as f:
            ts = json.load(f).get("timesteps")
        if ts:
            print(f"Using package timestep grid: {list(ts)}")
            return tuple(ts)
    return None


def load_pipeline(args):
    from cv_diffusion_tpu.export import ServingPipeline, ServingConfig

    timesteps = parse_timesteps(args.model, args.timesteps)
    if args.format == "package":
        # The package records its own image size and step count
        # (model_config.json); CLI flags override only when passed (None
        # overrides are dropped by from_package).
        return ServingPipeline.from_package(
            args.model,
            image_size=args.image_size,
            num_inference_steps=args.num_steps,
            keep_aspect=not args.no_pad, seed=args.seed,
            batch_size=args.batch_size,
            deterministic=True if args.deterministic else None,
            timesteps=timesteps,
            use_pallas=False if getattr(args, "no_pallas", False) else None)

    cfg = ServingConfig(image_size=args.image_size or 256,
                        num_inference_steps=args.num_steps or 4,
                        keep_aspect=not args.no_pad, seed=args.seed,
                        batch_size=args.batch_size,
                        deterministic=args.deterministic,
                        timesteps=timesteps)
    # training checkpoint → pipeline
    import jax
    from cv_diffusion_tpu.config import diffusion_config
    from cv_diffusion_tpu.models import create_model, init_model
    from cv_diffusion_tpu.training import checkpoint as ckpt
    from cv_diffusion_tpu.export.serving import ServingPipeline as SP

    detected = ckpt.detect_variant(args.model)
    if detected and detected != args.variant:
        print(f"Variant: {detected} (auto-detected from artifact)")
        args.variant = detected
    model_cfg = diffusion_config(args.variant,
                                 image_size=cfg.image_size,
                                 num_inference_steps=cfg.num_inference_steps,
                                 dtype=args.dtype,
                                 prediction_type=ckpt.load_prediction_type(
                                     args.model) or "epsilon",
                                 use_pallas=not args.no_pallas)
    model, schedule = create_model(model_cfg)
    like = jax.eval_shape(lambda k: init_model(model, k), jax.random.key(0))
    like = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), like)["params"]
    params = ckpt.load_inference_params(args.model, like,
                                        use_ema=args.use_ema)
    return SP(model, schedule, params, cfg)


def enhance_file(pipe, in_path: Path, out_path: Path) -> float:
    img = np.array(Image.open(in_path).convert("RGB"))
    t0 = time.perf_counter()
    out = pipe(img)
    dt = time.perf_counter() - t0
    out_path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(out).save(out_path)
    return dt


def main():
    from cv_diffusion_tpu.utils.compile_opts import (
        maybe_enable_compilation_cache)
    maybe_enable_compilation_cache()  # CVDM_COMPILE_CACHE=<dir>
    p = argparse.ArgumentParser(description="Low-light enhancement inference")
    p.add_argument("--input", type=str, required=True,
                   help="Input image or directory")
    p.add_argument("--output", type=str, default="enhanced",
                   help="Output file or directory")
    p.add_argument("--model", type=str, required=True,
                   help="Checkpoint dir or serving package dir")
    p.add_argument("--format", type=str, default="checkpoint",
                   choices=["checkpoint", "package"])
    p.add_argument("--variant", type=str, default="small")
    p.add_argument("--image_size", type=int, default=None,
                   help="default: the package's recorded size, else 256")
    p.add_argument("--num_steps", type=int, default=None,
                   help="default: the package's recorded steps, else 4")
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--no_pad", action="store_true",
                   help="Plain resize instead of aspect-preserving pad")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--use_ema", action="store_true",
                   help="Use the EMA weights from a training checkpoint")
    p.add_argument("--batch_size", type=int, default=1,
                   help="Device batch for folder mode (pipe.batch); "
                        "1 = per-image (reference behavior)")
    p.add_argument("--no_pallas", action="store_true",
                   help="Force the XLA attention path (the Pallas kernel "
                        "is the forward-only default, like serving packages)")
    p.add_argument("--timesteps", type=str, default=None,
                   help="Comma-separated descending timestep grid overriding "
                        "the stock LCM grid (for sampler-regression-"
                        "distilled students; auto-detected from "
                        "student_timesteps.json when present)")
    p.add_argument("--deterministic", action="store_true",
                   help="Renoise-free DDIM-style sampling (quality improves "
                        "monotonically with --num_steps; the stochastic LCM "
                        "sampler peaks at ~4 steps)")
    args = p.parse_args()

    pipe = load_pipeline(args)
    in_path = Path(args.input)
    out_path = Path(args.output)

    if in_path.is_file():
        if out_path.suffix == "":
            out_path = out_path / in_path.name
        dt = enhance_file(pipe, in_path, out_path)
        print(f"{in_path.name}: {dt * 1000:.1f} ms → {out_path}")
        return

    exts = {".png", ".jpg", ".jpeg", ".bmp"}
    files = sorted(f for f in in_path.iterdir() if f.suffix.lower() in exts)
    if not files:
        print(f"No images found in {in_path}")
        sys.exit(1)
    if args.batch_size > 1:
        imgs = [np.array(Image.open(f).convert("RGB")) for f in files]
        t0 = time.perf_counter()
        outs = pipe.batch(imgs)
        dt = time.perf_counter() - t0
        out_path.mkdir(parents=True, exist_ok=True)
        for f, out in zip(files, outs):
            Image.fromarray(out).save(out_path / f.name)
        print(f"{len(files)} images | batch {args.batch_size} | "
              f"{dt:.2f} s total | {len(files) / dt:.2f} FPS "
              f"(includes compile)")
        return
    times = []
    for f in files:
        dt = enhance_file(pipe, f, out_path / f.name)
        times.append(dt)
        print(f"{f.name}: {dt * 1000:.1f} ms")
    # skip the first (compile) for the FPS summary
    steady = times[1:] or times
    print(f"\n{len(files)} images | mean {np.mean(steady) * 1000:.1f} ms "
          f"| {1.0 / np.mean(steady):.2f} FPS (steady-state)")


if __name__ == "__main__":
    main()
