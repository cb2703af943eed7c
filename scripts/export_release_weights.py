#!/usr/bin/env python
"""Export a training checkpoint's deployed (EMA) weights as a compact
params-only artifact suitable for committing to the repository.

Why this exists: training checkpoints live under gitignored ``runs/`` and
the build environment is ephemeral — every container reset deletes every
trained model, leaving the repo's quality evidence (committed eval JSONs)
without a reproducing artifact.  This CLI snapshots the deployed weights
(params + the sidecar metadata the auto-detection paths read) into a small
orbax dir that CAN be committed, and that every CLI already loads via
``checkpoint.load_inference_params`` (the reference ships no weights at
all and has no equivalent — its ``model_state_dict``-only save is
``/root/reference/src/scripts/train.py:208-216``).

Usage:
    python scripts/export_release_weights.py \
        --checkpoint runs/vpred256/best_model --out artifacts/vpred256_ema
"""

import argparse
import json
import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="Training checkpoint dir (best_model)")
    p.add_argument("--out", required=True, help="Output artifact dir")
    p.add_argument("--no_ema", action="store_true",
                   help="Export raw params instead of EMA")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # host-side copy, no device
    from cv_diffusion_tpu.training import checkpoint as ckpt

    params = ckpt.load_inference_params(args.checkpoint,
                                        use_ema=not args.no_ema)

    # Make the artifact self-describing: record the model architecture as
    # model_config.json (like serving packages do) so consumers don't have
    # to pass a matching --variant by hand; derived from the trainer meta.
    meta = None
    for meta_dir in (args.checkpoint, os.path.dirname(args.checkpoint)):
        src = os.path.join(meta_dir, ckpt.META_FILE)
        if os.path.exists(src):
            with open(src) as f:
                meta = json.load(f)
            meta_src = src
            break
    config_json = None
    src_cfg = os.path.join(args.checkpoint, "model_config.json")
    if os.path.exists(src_cfg):
        # student/params-only checkpoints already self-describe — carry it
        with open(src_cfg) as f:
            config_json = f.read()
    elif meta is not None:
        from cv_diffusion_tpu.config import diffusion_config, to_json
        tc = meta.get("config", {})
        config_json = to_json(diffusion_config(
            tc.get("unet_variant", "small"),
            image_size=tc.get("image_size", 256),
            num_inference_steps=tc.get("num_inference_steps", 4),
            prediction_type=tc.get("prediction_type") or "epsilon"))

    out = os.path.abspath(args.out)
    if os.path.exists(out):
        shutil.rmtree(out)
    ckpt.save_params(out, params, config_json)

    # carry the trainer metadata (prediction-type auto-detection reads it)
    if meta is not None:
        shutil.copy(meta_src, os.path.join(out, ckpt.META_FILE))
    # carry a student's deployment timestep grid when present
    grid = os.path.join(args.checkpoint, "student_timesteps.json")
    if os.path.exists(grid):
        shutil.copy(grid, os.path.join(out, "student_timesteps.json"))

    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    size_mb = sum(f.stat().st_size for f in Path(out).rglob("*")
                  if f.is_file()) / 1e6
    print(json.dumps({"out": out, "num_params": int(n),
                      "artifact_mb": round(size_mb, 1)}))


if __name__ == "__main__":
    main()
