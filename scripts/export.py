#!/usr/bin/env python
"""Export CLI: training checkpoint → deployable serving package.

Mirrors the reference ``scripts/export.py:39-173``: load checkpoint, optional
quantization (bf16 / int8), emit a package (params + config + schedule table
+ optional serialized StableHLO sampler graph), optional post-export benchmark.
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
    p = argparse.ArgumentParser(description="Export model for serving")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="Training checkpoint dir (orbax) or params dir")
    p.add_argument("--output", type=str, default="export_package")
    p.add_argument("--variant", type=str, default="small")
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--num_steps", type=int, default=4)
    p.add_argument("--quantize", type=str, default="none",
                   choices=["none", "bf16", "int8", "int8_act"])
    p.add_argument("--calib_dir", type=str, default=None,
                   help="With --quantize int8_act: paired dataset dir "
                        "(root/{low,high}/) for PTQ activation calibration")
    p.add_argument("--calib_batches", type=int, default=4,
                   help="Calibration batches (batch 8) drawn from "
                        "--calib_dir")
    p.add_argument("--graph", action="store_true",
                   help="Also serialize the full sampler as StableHLO")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--dynamic_batch", action="store_true",
                   help="Export the StableHLO graph with a symbolic batch "
                        "dimension (serves any batch size, like the "
                        "reference's dynamic ONNX axes)")
    p.add_argument("--deterministic", action="store_true",
                   help="Package the renoise-free DDIM-style sampler "
                        "(recorded in model_config.json; pipelines built "
                        "from the package inherit it)")
    p.add_argument("--timesteps", type=str, default=None,
                   help="Comma-separated descending timestep grid overriding "
                        "the stock LCM grid (for sampler-regression-"
                        "distilled students; auto-detected from the "
                        "checkpoint's student_timesteps.json when present). "
                        "Recorded in the package; pipelines inherit it")
    p.add_argument("--use_ema", action="store_true",
                   help="Export the EMA weights from a training checkpoint")
    p.add_argument("--benchmark", action="store_true",
                   help="Benchmark the exported package after writing it")
    args = p.parse_args()

    import jax
    from cv_diffusion_tpu.config import diffusion_config
    from cv_diffusion_tpu.models import create_model, init_model
    from cv_diffusion_tpu.training import checkpoint as ckpt
    from cv_diffusion_tpu.export import (create_serving_package,
                                         ServingPipeline, ServingConfig)

    model_cfg = diffusion_config(args.variant, image_size=args.image_size,
                                 num_inference_steps=args.num_steps,
                                 prediction_type=ckpt.load_prediction_type(
                                     args.checkpoint) or "epsilon")
    model, schedule = create_model(model_cfg)
    like = jax.eval_shape(lambda k: init_model(model, k), jax.random.key(0))
    like = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), like)["params"]

    params = ckpt.load_inference_params(args.checkpoint, like,
                                        use_ema=args.use_ema)

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from inference import parse_timesteps
    timesteps = parse_timesteps(args.checkpoint, args.timesteps)

    act_scales = None
    if args.quantize == "int8_act":
        # PTQ activation calibration on real paired data, then package the
        # int8-compute path (reference analogue: static quantization,
        # ``src/export/quantization.py:172-214``, never calibrated there).
        if not args.calib_dir:
            p.error("--quantize int8_act requires --calib_dir")
        from cv_diffusion_tpu.data import LowLightDataset, DataLoader
        from cv_diffusion_tpu.export.quantization import (act_quant_model,
                                                          calibrate_act_scales)
        ds = LowLightDataset(args.calib_dir, image_size=args.image_size,
                             augment_data=False)
        loader = DataLoader(ds, 8)
        batches = []
        for i, b in enumerate(loader):
            if i >= args.calib_batches:
                break
            batches.append(b)
        qmodel, _ = act_quant_model(model.config)
        act_scales = calibrate_act_scales(qmodel, schedule, params, batches)
        print(f"Calibrated act_scales on {len(batches)} batches")

    files = create_serving_package(
        args.output, model, schedule, params,
        num_inference_steps=args.num_steps, quantize=args.quantize,
        include_graph=args.graph, batch_size=args.batch_size,
        act_scales=act_scales,
        dynamic_batch=args.dynamic_batch, deterministic=args.deterministic,
        timesteps=timesteps)
    print("Exported package:")
    for k, v in files.items():
        print(f"  {k}: {v}")

    if args.benchmark:
        pipe = ServingPipeline.from_package(
            args.output, ServingConfig(image_size=args.image_size,
                                       num_inference_steps=args.num_steps))
        stats = pipe.benchmark(num_runs=10)
        print("\nBenchmark:")
        for k, v in stats.items():
            print(f"  {k}: {v:.2f}")


if __name__ == "__main__":
    main()
