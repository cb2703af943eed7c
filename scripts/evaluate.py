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
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--save_outputs", type=str, default=None,
                   help="Optionally write enhanced PNGs here")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from cv_diffusion_tpu.config import diffusion_config
    from cv_diffusion_tpu.data import LowLightDataset, DataLoader
    from cv_diffusion_tpu.models import (create_model, init_model, enhance,
                                         denormalize_image)
    from cv_diffusion_tpu.training import checkpoint as ckpt
    from cv_diffusion_tpu.training.metrics import psnr, ssim, mae

    model_cfg = diffusion_config(args.variant, image_size=args.image_size,
                                 num_inference_steps=args.num_steps,
                                 dtype=args.dtype)
    model, schedule = create_model(model_cfg)
    like = jax.eval_shape(lambda k: init_model(model, k), jax.random.key(0))
    like = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), like)["params"]
    import os
    params_dir = args.model
    if os.path.isdir(os.path.join(args.model, "params")):
        params_dir = os.path.join(args.model, "params")
    try:
        params = ckpt.load_params(params_dir, like)
    except Exception:
        raw = ckpt.load_raw(params_dir)
        key = "ema_params" if (args.use_ema and "ema_params" in raw) else "params"
        params = raw[key]

    # commit weights to device once — host-numpy params would re-transfer
    # the whole tree every batch (see ServingPipeline.__init__)
    params = jax.device_put(params)

    ds = LowLightDataset(args.data_dir, image_size=args.image_size,
                         augment_data=False)
    loader = DataLoader(ds, args.batch_size)

    from cv_diffusion_tpu.utils.compile_opts import tpu_compiler_options
    enh = jax.jit(lambda v, k, x: enhance(model, schedule, {"params": v}, k,
                                          x,
                                          num_inference_steps=args.num_steps),
                  compiler_options=tpu_compiler_options())

    psnrs, ssims, maes = [], [], []
    rng = jax.random.key(args.seed)
    idx = 0
    for batch in loader:
        rng, k = jax.random.split(rng)
        low = jnp.asarray(batch["low_light"])
        out = enh(params, k, low)
        # clip to the displayable range before metrics (what any consumer
        # of the image sees; sampler output can overshoot [-1, 1])
        pred = jnp.clip(denormalize_image(out.astype(jnp.float32)), 0.0, 1.0)
        target = denormalize_image(jnp.asarray(batch["normal_light"]))
        # per-image metrics so ragged final batches weight correctly
        for i in range(pred.shape[0]):
            psnrs.append(float(psnr(pred[i:i+1], target[i:i+1])))
            ssims.append(float(ssim(pred[i:i+1], target[i:i+1])))
            maes.append(float(mae(pred[i:i+1], target[i:i+1])))
            print(f"{batch['filenames'][i]}: psnr={psnrs[-1]:.2f} dB  "
                  f"ssim={ssims[-1]:.4f}")
            if args.save_outputs:
                from PIL import Image
                outdir = Path(args.save_outputs)
                outdir.mkdir(parents=True, exist_ok=True)
                img = np.clip(np.asarray(pred[i]) * 255, 0, 255).astype(
                    np.uint8)
                Image.fromarray(img).save(outdir / batch["filenames"][i])
            idx += 1

    print(f"\n{idx} images | PSNR {np.mean(psnrs):.2f} ± {np.std(psnrs):.2f} dB"
          f" | SSIM {np.mean(ssims):.4f} | MAE {np.mean(maes):.4f}")


if __name__ == "__main__":
    main()
