#!/usr/bin/env python
"""Evidence for the multi-chip DP serving claim (BENCHMARKS.md §DP serving).

Multi-chip hardware is not reachable from this environment, so the 8-chip
serving number cannot be measured directly.  This report produces the two
verifiable facts that justify (and bound) the linear extrapolation:

1. **Zero collectives** — compiles the DP-sharded sampler
   (`parallel.make_sharded_sample_fn`) for n ∈ {1,2,4,8} on the virtual
   CPU mesh and counts collective ops (all-reduce / all-gather /
   collective-permute / reduce-scatter / all-to-all) in the optimized HLO.
   A DP sampler with zero cross-chip collectives has no communication term:
   per-chip work is independent, so aggregate throughput is chips ×
   per-chip throughput by construction (each chip runs the same program it
   runs alone).
2. **No sharding overhead at n=1** — optionally (--on_chip) times the
   sharded-jit program on the one real chip against the plain single-device
   sampler, confirming the mesh machinery itself costs nothing.

The reference has no multi-device serving at all
(``/root/reference/src/training/trainer.py:142`` pins a single device).
"""

import argparse
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

COLLECTIVE_RE = re.compile(
    r"\b(all-reduce|all-gather|collective-permute|reduce-scatter|"
    r"all-to-all)\b")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--on_chip", action="store_true",
                   help="Also time the n=1 sharded program on the real TPU "
                        "vs the plain sampler (needs the axon backend)")
    p.add_argument("--variant", default="small")
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax
    if not args.on_chip:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from cv_diffusion_tpu.config import diffusion_config
    from cv_diffusion_tpu.models.diffusion import create_model, init_model
    from cv_diffusion_tpu.parallel import make_sharded_sample_fn
    from cv_diffusion_tpu.parallel.mesh import make_mesh

    if args.on_chip:
        _on_chip_timing(args)
        return

    # HLO collective census on the virtual mesh: tiny shapes — the HLO op
    # *set* is shape-independent for this graph, and tiny compiles fast.
    cfg = diffusion_config("tiny", image_size=32, dtype="float32",
                           use_pallas=False)
    model, schedule = create_model(cfg)
    variables = jax.jit(lambda k: init_model(model, k))(jax.random.key(0))
    key_data = jax.random.key_data(jax.random.key(1))
    ndev = len(jax.devices())
    print(f"virtual devices: {ndev}")
    print(f"{'mesh':>6} | {'HLO collective ops':>18} | verdict")
    print("-" * 46)
    for n in (1, 2, 4, 8):
        if n > ndev:
            continue
        mesh = make_mesh((n, 1), devices=jax.devices()[:n])
        fn = make_sharded_sample_fn(model, schedule,
                                    num_inference_steps=2, mesh=mesh)
        low = jnp.zeros((8, 32, 32, 3), jnp.float32)
        hlo = fn.lower(variables["params"], key_data,
                       low).compile().as_text()
        hits = COLLECTIVE_RE.findall(hlo)
        verdict = "independent per-chip program" if not hits else \
            f"COLLECTIVES PRESENT: {sorted(set(hits))}"
        print(f"{n:>6} | {len(hits):>18} | {verdict}")
    print("\nZero collectives at every mesh size ⇒ each chip executes the "
          "single-chip program\non its batch shard; aggregate throughput = "
          "n_chips × single-chip throughput\n(ICI unused; host feed is the "
          "only shared resource).")


def _on_chip_timing(args):
    import jax
    import jax.numpy as jnp
    from cv_diffusion_tpu.config import diffusion_config
    from cv_diffusion_tpu.models.diffusion import (create_model, enhance,
                                                   init_model)
    from cv_diffusion_tpu.parallel import make_sharded_sample_fn
    from cv_diffusion_tpu.parallel.mesh import make_mesh
    from cv_diffusion_tpu.utils.compile_opts import tpu_compiler_options

    cfg = diffusion_config(args.variant, image_size=args.image_size,
                           dtype="bfloat16", use_pallas=True)
    model, schedule = create_model(cfg)
    variables = jax.jit(lambda k: init_model(model, k))(jax.random.key(0))
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), variables["params"])
    key_data = jax.random.key_data(jax.random.key(1))
    make_low = jax.jit(lambda k: jax.random.uniform(
        k, (args.batch, args.image_size, args.image_size, 3),
        jnp.bfloat16, -1.0, -0.5))
    low = make_low(jax.random.key(2))
    jax.block_until_ready((params, low))

    def bench(fn, tag):
        out = fn(params, key_data, low)          # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(params, key_data, low)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{tag}: {args.batch / dt:.1f} img/s  ({dt * 1e3:.1f} ms)")
        return args.batch / dt

    plain = jax.jit(
        lambda v, k, x: enhance(model, schedule, {"params": v},
                                jax.random.wrap_key_data(k), x,
                                num_inference_steps=args.steps),
        compiler_options=tpu_compiler_options())
    t_plain = bench(plain, "plain single-device sampler")

    mesh = make_mesh((1, 1), devices=jax.devices()[:1])
    sharded = make_sharded_sample_fn(model, schedule,
                                     num_inference_steps=args.steps,
                                     mesh=mesh)
    t_shard = bench(sharded, "sharded-jit sampler, 1-device mesh")
    print(f"sharding overhead at n=1: {100 * (1 - t_shard / t_plain):+.1f}%")


if __name__ == "__main__":
    main()
