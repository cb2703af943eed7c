#!/usr/bin/env python
"""Quality evaluation CLI: PSNR / SSIM on a paired dataset (e.g. LOL eval15).

The reference never computes quality metrics (SURVEY §5); this is the
≤0.1 dB-parity gate tool: run it against a trained checkpoint (or serving
package) on LOL-15 and report PSNR/SSIM/MAE over the full 4-step sampler.
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
    p = argparse.ArgumentParser(description="PSNR/SSIM evaluation")
    p.add_argument("--data_dir", type=str, required=True,
                   help="Paired eval set (root/{low,high}/)")
    p.add_argument("--model", type=str, required=True,
                   help="Checkpoint dir or serving package")
    p.add_argument("--variant", type=str, default="small")
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--num_steps", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--seeds", type=int, default=1,
                   help="Number of eval seeds (seed..seed+N-1). Sampler "
                        "noise swings per-config means by ~0.2 dB "
                        "(BENCHMARKS.md), so any quality COMPARISON needs "
                        "N>=5: reports per-seed means and mean±std across "
                        "seeds")
    p.add_argument("--json", type=str, default=None,
                   help="Write per-image per-seed metrics as JSON (for "
                        "paired-delta comparison via compare_eval.py)")
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--save_outputs", type=str, default=None,
                   help="Optionally write enhanced PNGs here")
    p.add_argument("--no_pallas", action="store_true",
                   help="Force the XLA attention path (the Pallas kernel "
                        "is the forward-only default, like serving packages)")
    p.add_argument("--deterministic", action="store_true",
                   help="Renoise-free DDIM-style sampling (quality improves "
                        "monotonically with --num_steps; the stochastic LCM "
                        "sampler peaks at ~4 steps)")
    p.add_argument("--timesteps", type=str, default=None,
                   help="Comma-separated descending timestep grid overriding "
                        "the stock LCM grid (for sampler-regression-"
                        "distilled students; auto-detected from "
                        "student_timesteps.json when present)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from cv_diffusion_tpu.config import diffusion_config
    from cv_diffusion_tpu.data import LowLightDataset, DataLoader
    from cv_diffusion_tpu.models import (create_model, init_model, enhance,
                                         denormalize_image)
    from cv_diffusion_tpu.training import checkpoint as ckpt
    from cv_diffusion_tpu.training.metrics import (psnr, ssim, mae,
                                                   ms_ssim, gmsd)

    import os
    pkg_cfg_path = os.path.join(args.model, "model_config.json")
    is_package = False
    if os.path.exists(pkg_cfg_path):
        import json as _json
        with open(pkg_cfg_path) as f:
            is_package = _json.load(f).get("framework") == "cv_diffusion_tpu"

    if is_package:
        # Serving package: rebuild the model the package describes (incl.
        # act_quant for int8_act packages — evaluating those through a
        # plain model would silently skip the int8 compute path) and its
        # variables (params [+ act_scales]).
        from cv_diffusion_tpu.export.serving import load_serving_package
        model, schedule, variables, _pkg = load_serving_package(
            args.model, use_pallas=not args.no_pallas)
        print(f"Package: quantization={_pkg.get('quantization')}")
        if not (isinstance(variables, dict) and "params" in variables):
            variables = {"params": variables}
    else:
        # v-prediction checkpoints silently produce garbage when sampled as
        # epsilon — auto-detect the trained target from the artifact
        pred_type = ckpt.load_prediction_type(args.model) or "epsilon"
        if pred_type != "epsilon":
            print(f"Prediction type: {pred_type} (auto-detected)")
        detected = ckpt.detect_variant(args.model)
        if detected and detected != args.variant:
            print(f"Variant: {detected} (auto-detected from artifact)")
            args.variant = detected
        model_cfg = diffusion_config(args.variant,
                                     image_size=args.image_size,
                                     num_inference_steps=args.num_steps,
                                     dtype=args.dtype,
                                     prediction_type=pred_type,
                                     use_pallas=not args.no_pallas)
        model, schedule = create_model(model_cfg)
        like = jax.eval_shape(lambda k: init_model(model, k),
                              jax.random.key(0))
        like = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), like)["params"]
        variables = {"params": ckpt.load_inference_params(
            args.model, like, use_ema=args.use_ema)}

    # commit weights to device once — host-numpy params would re-transfer
    # the whole tree every batch (see ServingPipeline.__init__)
    variables = jax.device_put(variables)

    ds = LowLightDataset(args.data_dir, image_size=args.image_size,
                         augment_data=False)
    loader = DataLoader(ds, args.batch_size)

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from inference import parse_timesteps
    timesteps = parse_timesteps(args.model, args.timesteps)
    if timesteps is not None:
        print(f"Timestep grid: {list(timesteps)}")

    from cv_diffusion_tpu.utils.compile_opts import tpu_compiler_options
    enh = jax.jit(lambda v, k, x: enhance(model, schedule, v, k, x,
                                          num_inference_steps=args.num_steps,
                                          deterministic=args.deterministic,
                                          timesteps=timesteps),
                  compiler_options=tpu_compiler_options())

    # MS-SSIM needs H, W ≥ 11·2⁴ = 176 for its 5 dyadic scales
    with_perceptual = args.image_size >= 176

    def per_image_metrics(out, target):
        # clip to the displayable range before metrics (what any consumer
        # of the image sees; sampler output can overshoot [-1, 1])
        pred = jnp.clip(denormalize_image(out.astype(jnp.float32)), 0.0, 1.0)
        tgt = denormalize_image(target.astype(jnp.float32))

        def one_img(p, t):
            ms = (ms_ssim(p[None], t[None]) if with_perceptual
                  else jnp.zeros(()))
            return (psnr(p[None], t[None]), ssim(p[None], t[None]),
                    mae(p[None], t[None]), ms, gmsd(p[None], t[None]))

        m = jax.vmap(one_img)(pred, tgt)
        # uint8 fetch: 1 B/px through the tunnel instead of f32's 4
        pred_u8 = jnp.clip(pred * 255.0, 0, 255).astype(jnp.uint8)
        return m, pred_u8

    # One jitted call per batch (sampler + metrics). On the axon TPU backend
    # every eager op — even a per-image slice — is a separate remote compile,
    # so the whole loop body must live in two compiled programs.
    metrics_fn = jax.jit(per_image_metrics,
                         compiler_options=tpu_compiler_options())

    # Outer loop over eval seeds: the compiled sampler/metrics programs are
    # shape-specialized once and reused across seeds, so extra seeds cost
    # only device time (~seconds each), never a recompile.
    per_seed = {}  # seed -> {"psnr": [...], "ssim": [...], "mae": [...],
    #                         "files": [...]}
    for seed in range(args.seed, args.seed + args.seeds):
        psnrs, ssims, maes, files = [], [], [], []
        msssims, gmsds = [], []
        rng = jax.random.key(seed)
        idx = 0
        for batch in loader:
            rng, k = jax.random.split(rng)
            low_np = np.asarray(batch["low_light"])
            tgt_np = np.asarray(batch["normal_light"])
            # Pad a ragged final batch to the compiled batch size ON THE
            # HOST — the jitted sampler is shape-specialized and a
            # (n<batch) straggler would recompile the whole 4-step graph
            # (minutes on TPU).
            n_valid = low_np.shape[0]
            if n_valid < args.batch_size:
                pad = np.zeros(
                    (args.batch_size - n_valid,) + low_np.shape[1:],
                    low_np.dtype)
                low_np = np.concatenate([low_np, pad])
                tgt_np = np.concatenate([tgt_np, pad.astype(tgt_np.dtype)])
            out = enh(variables, k, jnp.asarray(low_np))
            (m_psnr, m_ssim, m_mae, m_ms, m_gmsd), pred_u8 = metrics_fn(
                out, jnp.asarray(tgt_np))
            m_psnr, m_ssim, m_mae = (np.asarray(m_psnr)[:n_valid],
                                     np.asarray(m_ssim)[:n_valid],
                                     np.asarray(m_mae)[:n_valid])
            m_ms = np.asarray(m_ms)[:n_valid]
            m_gmsd = np.asarray(m_gmsd)[:n_valid]
            # fetch the full (padded) uint8 batch, slice host-side: a device
            # [:n] slice would be another remote compile per distinct n
            save_now = args.save_outputs and seed == args.seed
            pred_u8 = np.asarray(pred_u8)[:n_valid] if save_now else None
            for i in range(n_valid):
                psnrs.append(float(m_psnr[i]))
                ssims.append(float(m_ssim[i]))
                maes.append(float(m_mae[i]))
                msssims.append(float(m_ms[i]))
                gmsds.append(float(m_gmsd[i]))
                files.append(batch["filenames"][i])
                if args.seeds == 1:
                    print(f"{batch['filenames'][i]}: psnr={psnrs[-1]:.2f} dB"
                          f"  ssim={ssims[-1]:.4f}")
                if save_now:
                    from PIL import Image
                    outdir = Path(args.save_outputs)
                    outdir.mkdir(parents=True, exist_ok=True)
                    Image.fromarray(pred_u8[i]).save(
                        outdir / batch["filenames"][i])
                idx += 1
        per_seed[seed] = {"psnr": psnrs, "ssim": ssims, "mae": maes,
                          "ms_ssim": msssims, "gmsd": gmsds, "files": files}
        perc = (f" | MS-SSIM {np.mean(msssims):.4f}" if with_perceptual
                else "")
        print(f"seed {seed}: {idx} images | "
              f"PSNR {np.mean(psnrs):.2f} ± {np.std(psnrs):.2f} dB | "
              f"SSIM {np.mean(ssims):.4f} | MAE {np.mean(maes):.4f}"
              f"{perc} | GMSD {np.mean(gmsds):.4f} (lower=better)")

    seed_means = [np.mean(per_seed[s]["psnr"]) for s in per_seed]
    seed_ssims = [np.mean(per_seed[s]["ssim"]) for s in per_seed]
    if args.seeds > 1:
        print(f"\n{args.seeds} seeds | "
              f"PSNR {np.mean(seed_means):.2f} ± {np.std(seed_means):.2f} dB"
              f" (across-seed std of means) | "
              f"SSIM {np.mean(seed_ssims):.4f} ± {np.std(seed_ssims):.4f}")
    else:
        s = args.seed
        print(f"\n{len(per_seed[s]['psnr'])} images | "
              f"PSNR {np.mean(per_seed[s]['psnr']):.2f} ± "
              f"{np.std(per_seed[s]['psnr']):.2f} dB | "
              f"SSIM {np.mean(per_seed[s]['ssim']):.4f} | "
              f"MAE {np.mean(per_seed[s]['mae']):.4f}")

    if args.json:
        import json
        payload = {
            "model": args.model, "variant": args.variant,
            "image_size": args.image_size, "num_steps": args.num_steps,
            "deterministic": args.deterministic,
            "timesteps": None if timesteps is None else
            [int(t) for t in timesteps],
            "seeds": {str(s): {k: per_seed[s][k] for k in
                               ("psnr", "ssim", "mae", "ms_ssim", "gmsd",
                                "files")}
                      for s in per_seed},
            "summary": {"psnr_mean": float(np.mean(seed_means)),
                        "psnr_std_across_seeds": float(np.std(seed_means)),
                        "ssim_mean": float(np.mean(seed_ssims)),
                        "ms_ssim_mean": (float(np.mean(
                            [np.mean(per_seed[s]["ms_ssim"])
                             for s in per_seed])) if with_perceptual
                            else None),
                        "gmsd_mean": float(np.mean(
                            [np.mean(per_seed[s]["gmsd"])
                             for s in per_seed]))},
        }
        Path(args.json).parent.mkdir(parents=True, exist_ok=True)
        Path(args.json).write_text(json.dumps(payload, indent=1))
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
