#!/usr/bin/env python
"""Profile the sampler or training step: trace capture + XLA cost analysis.

The reference has no profiling subsystem at all (SURVEY §5 — wall-clock
micro-benchmarks only, ``scripts/benchmark.py:72-79``).  This CLI exposes the
TPU-native observability stack in one place:

* wall-clock stats with ``block_until_ready`` (the cuda-synchronize analogue),
* XLA's own cost analysis — flops, bytes accessed, arithmetic intensity and
  the implied sustained HBM bandwidth at the measured wall clock (the numbers
  behind BENCHMARKS.md's roofline audit),
* optional ``jax.profiler`` trace capture (open in Perfetto / TensorBoard's
  profile plugin) — verified working through the axon remote backend.

Examples:
    python scripts/profile.py --variant small --image_size 256 --batch 32
    python scripts/profile.py --train --batch 32
    python scripts/profile.py --trace_dir /tmp/jax-trace --iters 3
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_sampler(args):
    import jax
    from cv_diffusion_tpu.config import diffusion_config
    from cv_diffusion_tpu.export.quantization import quantize_bf16
    from cv_diffusion_tpu.models import create_model, enhance, init_model
    from cv_diffusion_tpu.utils.compile_opts import tpu_compiler_options

    cfg = diffusion_config(args.variant, image_size=args.image_size,
                           num_inference_steps=args.steps, dtype=args.dtype,
                           use_pallas=True)
    model, schedule = create_model(cfg)
    variables = jax.jit(lambda k: init_model(model, k))(jax.random.key(0))
    if args.params_dtype in ("bf16", "bfloat16"):
        variables = jax.jit(quantize_bf16)(variables)
    jax.block_until_ready(variables)
    low = jax.jit(lambda k: jax.random.uniform(
        k, (args.batch, args.image_size, args.image_size, 3),
        minval=-1.0, maxval=-0.5))(jax.random.key(1))

    fn = jax.jit(
        lambda v, k, x: enhance(model, schedule, v, k, x,
                                num_inference_steps=args.steps),
        compiler_options=tpu_compiler_options())
    return fn, (variables, jax.random.key(2), low)


def build_train_step(args):
    import jax
    from cv_diffusion_tpu.config import TrainConfig, diffusion_config
    from cv_diffusion_tpu.models import create_model
    from cv_diffusion_tpu.training.train_state import (create_train_state,
                                                       make_train_step)

    tcfg = TrainConfig(unet_variant=args.variant,
                       image_size=args.image_size, batch_size=args.batch)
    model, schedule = create_model(
        diffusion_config(args.variant, image_size=args.image_size,
                         dtype="bfloat16"))
    state = create_train_state(model, tcfg, jax.random.key(0))
    jax.block_until_ready(state.params)
    # donate=False: profiling re-runs the step on the same state.
    step = make_train_step(model, schedule, tcfg, donate=False)
    batch = jax.jit(lambda k: {
        "low_light": jax.random.uniform(
            k, (args.batch, args.image_size, args.image_size, 3),
            minval=-1.0, maxval=-0.5),
        "normal_light": jax.random.uniform(
            k, (args.batch, args.image_size, args.image_size, 3),
            minval=-0.2, maxval=1.0)})(jax.random.key(1))
    jax.block_until_ready(batch)
    return step, (state, batch)


def cost_analysis(fn, fn_args):
    """flops / bytes for the compiled program (None if not exposed);
    thin wrapper over utils.profiling.flops_estimate (jit is idempotent,
    so passing the already-jitted fn is fine)."""
    from cv_diffusion_tpu.utils.profiling import flops_estimate

    cost = flops_estimate(fn, *fn_args)
    if cost is None:
        print("(cost analysis unavailable on this backend)", file=sys.stderr)
    return cost


def main():
    p = argparse.ArgumentParser(
        description="Profile the jitted sampler / training step")
    p.add_argument("--variant", default="small")
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--batch", type=int, default=None,
                   help="default: 128 sampler / 32 train")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--params_dtype", default="bf16")
    p.add_argument("--train", action="store_true",
                   help="profile the training step instead of the sampler")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--trace_dir", default=None,
                   help="capture a jax.profiler trace of the timed iters "
                        "into this directory (Perfetto/TensorBoard)")
    p.add_argument("--hbm_peak_gbps", type=float, default=819.0,
                   help="HBM peak for the bandwidth roofline (v5e: 819)")
    args = p.parse_args()
    if args.batch is None:
        args.batch = 32 if args.train else 128

    import jax
    from cv_diffusion_tpu.utils.profiling import (device_memory_stats,
                                                  timeit, trace)

    print(f"devices: {jax.devices()}", file=sys.stderr)
    fn, fn_args = (build_train_step if args.train else build_sampler)(args)

    out = fn(*fn_args)  # compile
    jax.block_until_ready(out)

    stats = timeit(fn, *fn_args, warmup=args.warmup, iters=args.iters)
    if args.trace_dir:
        with trace(args.trace_dir):
            for _ in range(min(args.iters, 3)):
                jax.block_until_ready(fn(*fn_args))
        print(f"trace written to {args.trace_dir}", file=sys.stderr)

    report = {
        "target": "train_step" if args.train else "sampler",
        "config": f"{args.variant}@{args.image_size} b{args.batch}"
                  + ("" if args.train else f" {args.steps}-step"),
        "wall_clock_ms": {k: round(v, 2) for k, v in stats.items()},
        "throughput_img_per_s": round(
            args.batch / (stats["p50_ms"] / 1000.0), 2),
    }

    cost = cost_analysis(fn, fn_args)
    if cost and cost["bytes_accessed"] > 0:
        t = stats["p50_ms"] / 1000.0
        gib = cost["bytes_accessed"] / 2**30
        report["cost_analysis"] = {
            "gflops": round(cost["flops"] / 1e9, 1),
            "bytes_accessed_gib": round(gib, 2),
            "arithmetic_intensity_flop_per_byte": round(
                cost["flops"] / cost["bytes_accessed"], 1),
            "sustained_bw_gibps": round(gib / t, 1),
            "pct_of_hbm_peak": round(
                100.0 * (gib / t) / (args.hbm_peak_gbps / 1.0737), 1),
        }
    mem = device_memory_stats()
    if mem:
        report["device_memory"] = {
            k: round(v / 2**30, 3) for k, v in mem.items()
            if "bytes" in k}
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
