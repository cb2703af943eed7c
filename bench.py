#!/usr/bin/env python
"""Headline benchmark: 4-step LCM enhancement throughput, 256×256, bf16.

Prints exactly one JSON line:
    {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline: 5000 images/sec/chip — the BASELINE.json north-star target for the
small variant at 4 LCM steps on one TPU v5e chip (the reference itself only
claims ~10 FPS end-to-end on a Snapdragon 888, ``README.md:18,22``).

The whole 4-step sampler (UNet ×4 + scheduler renoise) runs as one jitted
scanned XLA graph; batch size amortizes the small model over the MXU.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])


def _backend_reachable(timeout: float = 600.0) -> bool:
    """Probe backend init in a SUBPROCESS: when the TPU tunnel is down,
    ``jax.devices()`` hangs forever with no error (observed outage), which
    would hang the whole bench run. A bounded probe lets us emit an
    explanatory JSON line instead. Normal init is <30 s; 600 s is margin."""
    try:
        r = subprocess.run([sys.executable, "-c",
                            "import jax; jax.devices()"],
                           timeout=timeout, env=os.environ.copy(),
                           capture_output=True)
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


import jax  # importing jax does NOT init the backend; jax.devices() does

from cv_diffusion_tpu.config import diffusion_config
from cv_diffusion_tpu.models.diffusion import create_model, enhance, init_model

BASELINE_IMG_PER_SEC = 5000.0


def main():
    from cv_diffusion_tpu.utils.compile_opts import (
        maybe_enable_compilation_cache)
    maybe_enable_compilation_cache()  # CVDM_COMPILE_CACHE=<dir>
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="small")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--steps", type=int, default=4)
    # 128 ≈ HBM-optimal for the small variant at 256² (256 OOMs at 27G/16G);
    # None → 128 for the sampler, 32 for --train.
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--params-dtype", default="bf16",
                   help="bf16 (serving default) or fp32")
    p.add_argument("--sweep", action="store_true",
                   help="Run the regression sweep (8-step, 512², tiny/base "
                        "rows) instead of the single headline config; prints "
                        "one JSON line per config")
    p.add_argument("--train", action="store_true",
                   help="Benchmark the TRAINING step (fwd+bwd+optax+EMA, "
                        "donated, production path) instead of the sampler; "
                        "default batch 32")
    p.add_argument("--remat", action="store_true",
                   help="With --train: rematerialize blocks in the backward "
                        "pass (UNetConfig.remat) — fits larger batches")
    p.add_argument("--remat_policy", default="full",
                   choices=("full", "conv"),
                   help="With --remat: what checkpointed blocks save — "
                        "'full' saves nothing; 'conv' saves QConv outputs "
                        "and recomputes only elementwise work (traffic cut)")
    p.add_argument("--remat_scope", default="all",
                   choices=("all", "decoder"),
                   help="With --remat: which blocks rematerialize "
                        "('decoder' = mid + decoder, the widest activations)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="With --train: micro-batches per optimizer update "
                        "(lax.scan inside the step); batch must divide "
                        "evenly. 1 = off")
    p.add_argument("--split_skip", action="store_true",
                   help="Decoder concat-split rewrite (UNetConfig."
                        "split_skip): first block per level consumes "
                        "(upsampled, skip) without materializing the concat")
    args = p.parse_args()

    if not _backend_reachable():
        print(json.dumps({
            "metric": "small_4step_256px_enhance_throughput",
            "value": 0.0, "unit": "images/sec/chip", "vs_baseline": 0.0,
            "error": "backend unreachable: jax.devices() did not return "
                     "within 600s (TPU tunnel down); see BENCHMARKS.md for "
                     "the last measured rows"}))
        sys.exit(1)

    if args.sweep:
        return run_sweep(args)
    if args.train:
        result = run_train(args.variant, args.image_size,
                           args.batch if args.batch is not None else 32,
                           args.iters, args.warmup, remat=args.remat,
                           grad_accum=args.grad_accum,
                           remat_policy=args.remat_policy,
                           remat_scope=args.remat_scope)
        print(json.dumps(result))
        return

    batch = args.batch if args.batch is not None else 128
    result = run_config(args.variant, args.image_size, args.steps, batch,
                        args.iters, args.warmup, args.dtype, args.params_dtype,
                        split_skip=args.split_skip)
    print(json.dumps(result))


# (variant, image_size, steps, batch) — batches sized to the 16G HBM ceiling
# (small@256 OOMs above b128; 512² has 4x the activation traffic).
SWEEP_CONFIGS = [
    ("small", 256, 4, 128),
    ("small", 256, 8, 128),
    ("small", 512, 4, 32),
    ("tiny", 256, 4, 128),
    ("base", 256, 4, 64),
]


# Training-step regression rows: (variant, size, batch, grad_accum).
# b32 = the plain-step config; b256/accum8 = the effective-big-batch
# config (micro-batch 32), the fastest measured train path (BENCHMARKS.md
# §remat).
TRAIN_SWEEP_CONFIGS = [
    ("small", 256, 32, 1),
    ("small", 256, 256, 8),
]


def run_sweep(args):
    """Per-config rows recorded each round so cross-config perf regressions
    are visible (VERDICT r1 item 10; train rows: VERDICT r2 item 10)."""
    for variant, size, steps, batch in SWEEP_CONFIGS:
        try:
            result = run_config(variant, size, steps, batch, args.iters,
                                args.warmup, args.dtype, args.params_dtype)
        except Exception as e:  # OOM on smaller chips: record, keep going
            result = {"metric": f"{variant}_{steps}step_{size}px_enhance_"
                                f"throughput", "error": str(e)[:200]}
        print(json.dumps(result), flush=True)
    for variant, size, batch, accum in TRAIN_SWEEP_CONFIGS:
        try:
            result = run_train(variant, size, batch, args.iters, args.warmup,
                               grad_accum=accum)
        except Exception as e:
            result = {"metric": f"{variant}_train_step_{size}px_throughput",
                      "error": str(e)[:200]}
        print(json.dumps(result), flush=True)


def run_train(variant, image_size, batch, iters, warmup, remat=False,
              grad_accum=1, remat_policy="full", remat_scope="all"):
    """Training-step throughput (the full production step: value_and_grad,
    optax update, EMA, donation, 64M scoped VMEM). Tracked per round like
    the sampler rows; reference equivalent: ``src/training/trainer.py``
    has no throughput instrumentation at all."""
    from cv_diffusion_tpu.config import TrainConfig
    from cv_diffusion_tpu.training.train_state import (create_train_state,
                                                       make_train_step)

    tcfg = TrainConfig(unet_variant=variant, image_size=image_size,
                       batch_size=batch, remat=remat,
                       grad_accum_steps=grad_accum)
    model, schedule = create_model(diffusion_config(variant,
                                                    image_size=image_size,
                                                    dtype="bfloat16",
                                                    remat=remat,
                                                    remat_policy=remat_policy,
                                                    remat_scope=remat_scope))
    state = create_train_state(model, tcfg, jax.random.key(0))
    jax.block_until_ready(state.params)
    step = make_train_step(model, schedule, tcfg)
    make_batch = jax.jit(lambda k: {
        "low_light": jax.random.uniform(
            k, (batch, image_size, image_size, 3), minval=-1.0, maxval=-0.5),
        "normal_light": jax.random.uniform(
            k, (batch, image_size, image_size, 3), minval=-0.2, maxval=1.0)})
    batch_data = make_batch(jax.random.key(1))
    jax.block_until_ready(batch_data)

    state, _ = step(state, batch_data)          # compile
    jax.block_until_ready(state.params)
    for _ in range(warmup):
        state, _ = step(state, batch_data)
    jax.block_until_ready(state.params)

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        state, metrics = step(state, batch_data)
        jax.block_until_ready(state.params)
        times.append(time.perf_counter() - t0)
    times.sort()
    p50 = times[len(times) // 2]
    return {
        "metric": (f"{variant}_train_step_{image_size}px_throughput"
                   + ("_remat" if remat else "")
                   + (f"_{remat_policy}" if remat and remat_policy != "full"
                      else "")
                   + (f"_{remat_scope}" if remat and remat_scope != "all"
                      else "")
                   + (f"_accum{grad_accum}" if grad_accum > 1 else "")),
        "value": round(batch / p50, 2),
        "unit": "images/sec/chip",
        "vs_baseline": None,
    }


def run_config(variant, image_size, steps, batch, iters, warmup, dtype,
               params_dtype, split_skip=False):
    # use_pallas: the fused linear-attention kernel is the shipped serving
    # default (whole-model +3.9% small@128, never slower — BENCHMARKS.md);
    # forward-only, so bench/serving enable it while training keeps XLA.
    cfg = diffusion_config(variant, image_size=image_size,
                           num_inference_steps=steps, dtype=dtype,
                           use_pallas=True, split_skip=split_skip)
    model, schedule = create_model(cfg)

    # Keep every device op inside jit: eager dispatch is pathologically slow
    # on remotely-compiled backends.
    variables = jax.jit(lambda k: init_model(model, k))(jax.random.key(0))
    if params_dtype in ("bf16", "bfloat16"):
        # bf16 weights = the shipped serving quantization; halves weight
        # reads (measured +3% throughput at batch 128).
        from cv_diffusion_tpu.export.quantization import quantize_bf16
        variables = jax.jit(quantize_bf16)(variables)
    jax.block_until_ready(variables)

    make_low = jax.jit(lambda k: jax.random.uniform(
        k, (batch, image_size, image_size, 3),
        minval=-1.0, maxval=-0.5))
    low = make_low(jax.random.key(1))

    # Scoped-VMEM 64M: larger fusion scratch, +2-2.6% measured on-chip
    # (utils/compile_opts.py); None on CPU.
    from cv_diffusion_tpu.utils.compile_opts import tpu_compiler_options
    enh = jax.jit(lambda v, k, x: enhance(model, schedule, v, k, x,
                                          num_inference_steps=steps),
                  compiler_options=tpu_compiler_options())

    # Warmup / compile
    out = enh(variables, jax.random.key(2), low)
    out.block_until_ready()
    for i in range(warmup):
        out = enh(variables, jax.random.key(3 + i), low)
    out.block_until_ready()

    # Timed
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = enh(variables, jax.random.key(100 + i), low)
        out.block_until_ready()
        times.append(time.perf_counter() - t0)

    times.sort()
    p50 = times[len(times) // 2]
    img_per_sec = batch / p50

    return {
        "metric": (f"{variant}_{steps}step_{image_size}px_enhance_throughput"
                   + ("_splitskip" if split_skip else "")),
        "value": round(img_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 4),
    }


if __name__ == "__main__":
    main()
