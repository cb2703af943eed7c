#!/usr/bin/env python
"""Benchmark CLI.

Mirrors the reference ``scripts/benchmark.py:47-193``: latency stats
(mean/std/min/max), per-step latency, 30-FPS real-time verdict — plus the TPU
throughput sweep (images/sec/chip vs batch size) the reference lacks.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

REALTIME_FPS = 30.0


def benchmark_sampler(args):
    import jax
    from cv_diffusion_tpu.config import diffusion_config
    from cv_diffusion_tpu.models import create_model, init_model, enhance

    cfg = diffusion_config(args.variant, image_size=args.image_size,
                           num_inference_steps=args.num_steps,
                           dtype=args.dtype,
                           use_pallas=not args.no_pallas)
    model, schedule = create_model(cfg)
    variables = jax.jit(lambda k: init_model(model, k))(jax.random.key(0))
    jax.block_until_ready(variables)

    results = []
    for batch in args.batch_sizes:
        low = jax.jit(lambda k: jax.random.uniform(
            k, (batch, args.image_size, args.image_size, 3),
            minval=-1.0, maxval=-0.5))(jax.random.key(1))
        from cv_diffusion_tpu.utils.compile_opts import tpu_compiler_options
        enh = jax.jit(lambda v, k, x: enhance(
            model, schedule, v, k, x, num_inference_steps=args.num_steps),
            compiler_options=tpu_compiler_options())
        out = enh(variables, jax.random.key(2), low)
        out.block_until_ready()
        times = []
        for i in range(args.num_runs):
            t0 = time.perf_counter()
            out = enh(variables, jax.random.key(10 + i), low)
            out.block_until_ready()
            times.append(time.perf_counter() - t0)
        arr = np.asarray(times) * 1000
        results.append({
            "batch": batch,
            "mean_ms": float(arr.mean()),
            "std_ms": float(arr.std()),
            "min_ms": float(arr.min()),
            "max_ms": float(arr.max()),
            "per_step_ms": float(arr.mean() / args.num_steps),
            "per_image_ms": float(arr.mean() / batch),
            "img_per_sec": float(batch / (arr.mean() / 1000)),
        })
    return results


def benchmark_model(args):
    """Benchmark a TRAINED artifact end-to-end (uint8→uint8, per-stage) —
    the reference's benchmark-an-exported-model path
    (``scripts/benchmark.py:47-128`` with --model/--format)."""
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from inference import load_pipeline

    pipe = load_pipeline(args)
    stats = pipe.benchmark(num_runs=args.num_runs)
    print(f"\nEnd-to-end pipeline ({args.format}: {args.model}):")
    for k, v in stats.items():
        print(f"  {k:>16}: {v:.2f}")
    budget_ms = 1000.0 / REALTIME_FPS
    verdict = ("REAL-TIME ✓" if stats["mean_ms"] <= budget_ms
               else "not real-time")
    print(f"\nBatch-1 end-to-end: {stats['mean_ms']:.1f} ms vs "
          f"{budget_ms:.1f} ms budget ({REALTIME_FPS:.0f} FPS): {verdict}")


def main():
    from cv_diffusion_tpu.utils.compile_opts import (
        maybe_enable_compilation_cache)
    maybe_enable_compilation_cache()  # CVDM_COMPILE_CACHE=<dir>
    p = argparse.ArgumentParser(description="Benchmark the TPU sampler")
    p.add_argument("--variant", type=str, default="small")
    # None defaults: with --model --format package, load_pipeline reads the
    # package's recorded size/steps unless these are passed explicitly
    # (a truthy default here would silently benchmark the wrong sampler).
    p.add_argument("--image_size", type=int, default=None,
                   help="default: 256, or the package's recorded size")
    p.add_argument("--num_steps", type=int, default=None,
                   help="default: 4, or the package's recorded steps")
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--batch_sizes", type=int, nargs="+", default=[1, 8, 32])
    p.add_argument("--num_runs", type=int, default=10)
    p.add_argument("--profile", type=str, default=None,
                   help="Capture a jax.profiler trace to this directory")
    p.add_argument("--model", type=str, default=None,
                   help="Benchmark a trained artifact (checkpoint dir or "
                        "serving package) end-to-end instead of a "
                        "random-init variant")
    p.add_argument("--format", type=str, default="checkpoint",
                   choices=["checkpoint", "package"])
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no_pallas", action="store_true",
                   help="Force the XLA attention path (the Pallas kernel "
                        "is the forward-only default, like bench.py)")
    p.add_argument("--timesteps", type=str, default=None,
                   help="Explicit sampler grid (comma-separated); default: "
                        "the artifact's recorded student/package grid")
    p.add_argument("--deterministic", action="store_true",
                   help="Renoise-free ddim_step sampler")
    args = p.parse_args()
    # load_pipeline compatibility (inference.py arg surface)
    args.no_pad = False
    args.batch_size = 1

    if args.model:
        return benchmark_model(args)

    # random-init variant path: apply the plain defaults
    args.image_size = args.image_size or 256
    args.num_steps = args.num_steps or 4

    print(f"Benchmarking {args.variant} @ {args.image_size}px, "
          f"{args.num_steps} LCM steps, {args.dtype}")
    if args.profile:
        from cv_diffusion_tpu.utils.profiling import trace
        with trace(args.profile):
            results = benchmark_sampler(args)
        print(f"Trace written to {args.profile} (open in Perfetto/TensorBoard)")
    else:
        results = benchmark_sampler(args)

    print(f"\n{'batch':>6} {'mean ms':>9} {'std':>7} {'min':>8} {'max':>8} "
          f"{'ms/step':>8} {'ms/img':>8} {'img/s':>9}")
    for r in results:
        print(f"{r['batch']:>6} {r['mean_ms']:>9.2f} {r['std_ms']:>7.2f} "
              f"{r['min_ms']:>8.2f} {r['max_ms']:>8.2f} "
              f"{r['per_step_ms']:>8.2f} {r['per_image_ms']:>8.2f} "
              f"{r['img_per_sec']:>9.1f}")

    # 30-FPS real-time verdict on batch-1 latency
    # (``scripts/benchmark.py:170-189``).
    b1 = next((r for r in results if r["batch"] == 1), None)
    if b1 is None:
        print("\n(no batch-1 row in --batch_sizes; skipping the real-time "
              "verdict — it is a single-image latency budget)")
        return
    budget_ms = 1000.0 / REALTIME_FPS
    verdict = "REAL-TIME ✓" if b1["mean_ms"] <= budget_ms else "not real-time"
    print(f"\nBatch-1 end-to-end: {b1['mean_ms']:.1f} ms vs "
          f"{budget_ms:.1f} ms budget ({REALTIME_FPS:.0f} FPS): {verdict}")
    if b1["mean_ms"] > budget_ms:
        print("Suggestions: fewer LCM steps (--num_steps 2), smaller variant "
              "(--variant tiny), int8 weights, or batch for throughput.")


if __name__ == "__main__":
    main()
