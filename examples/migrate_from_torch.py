#!/usr/bin/env python
"""Migrate a trained reference-PyTorch checkpoint into this framework.

Usage:
    python examples/migrate_from_torch.py ref_checkpoint.pt out_package/

Loads the torch checkpoint (``model_state_dict`` with ``unet.``-prefixed keys,
as written by the reference trainer), converts the UNet weights to an NHWC
flax tree, verifies shapes, and writes a TPU serving package.

The reverse direction (TPU-trained weights → reference PyTorch model) is
``utils.torch_compat.export_unet_state_dict``; ``scripts/parity_eval.py``
uses it to run both frameworks' samplers on the same trained weights.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    ckpt_path, out_dir = sys.argv[1], sys.argv[2]

    import torch

    import jax
    from cv_diffusion_tpu.config import diffusion_config, unet_config
    from cv_diffusion_tpu.models import create_model
    from cv_diffusion_tpu.utils.torch_compat import convert_unet_state_dict
    from cv_diffusion_tpu.export import create_serving_package

    raw = torch.load(ckpt_path, map_location="cpu")
    sd = raw.get("model_state_dict", raw)
    # strip the LowLightDiffusion wrapper prefix
    unet_sd = {k[len("unet."):]: v for k, v in sd.items()
               if k.startswith("unet.")}
    if not unet_sd:
        unet_sd = sd

    # infer the variant from base channel width
    base = unet_sd["init_conv.weight"].shape[0]
    variant = {16: "tiny", 32: "small", 48: "base", 64: "large"}[base]
    in_ch = unet_sd["init_conv.weight"].shape[1]
    print(f"variant={variant}, in_channels={in_ch}")

    cfg = diffusion_config(variant, image_size=256,
                           condition_mode="concat" if in_ch == 6 else "add")
    model, schedule = create_model(cfg)
    params = {"unet": convert_unet_state_dict(unet_sd, cfg.unet)}
    if in_ch == 3:
        # add-mode checkpoints carry the condition_encoder — without it the
        # flax model fails at apply time.
        from cv_diffusion_tpu.utils.torch_compat import (
            convert_condition_encoder_state_dict)

        params["condition_encoder"] = convert_condition_encoder_state_dict(sd)
    params = jax.tree_util.tree_map(jax.numpy.asarray, params)

    files = create_serving_package(out_dir, model, schedule, params,
                                   num_inference_steps=4)
    print("Converted package:")
    for k, v in files.items():
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
