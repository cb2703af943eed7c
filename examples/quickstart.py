#!/usr/bin/env python
"""Quickstart: build, train a few steps, sample, export — end to end.

Run on CPU:  JAX_PLATFORMS=cpu python examples/quickstart.py
On TPU, drop the env var (everything here is jitted — safe for remote
backends).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from cv_diffusion_tpu.config import TrainConfig, diffusion_config
from cv_diffusion_tpu.models import create_model, enhance, init_model
from cv_diffusion_tpu.training import create_train_state, make_train_step
from cv_diffusion_tpu.export import create_serving_package, ServingPipeline

# 1. Model + schedule (tiny for the demo; use "small" for real work).
cfg = diffusion_config("tiny", image_size=64, num_inference_steps=4)
model, schedule = create_model(cfg)

# 2. A couple of training steps on random data.
tcfg = TrainConfig(unet_variant="tiny", image_size=64, batch_size=4, epochs=1)
state = create_train_state(model, tcfg, jax.random.key(0), steps_per_epoch=10)
step = make_train_step(model, schedule, tcfg)

make_batch = jax.jit(lambda k: {
    "low_light": jax.random.uniform(k, (4, 64, 64, 3), minval=-1, maxval=0),
    "normal_light": jax.random.uniform(k, (4, 64, 64, 3), minval=-1, maxval=1),
})
for i in range(3):
    state, metrics = step(state, make_batch(jax.random.key(i)))
    print(f"step {i}: loss={float(metrics['loss']):.4f}")

# 3. Sample (the whole 4-step LCM loop is one compiled graph).
low = make_batch(jax.random.key(99))["low_light"]
out = jax.jit(lambda p, k, x: enhance(model, schedule, {"params": p}, k, x))(
    state.ema_params, jax.random.key(0), low)
print("enhanced:", out.shape, float(out.min()), float(out.max()))

# 4. Export a serving package and serve a uint8 image.
import numpy as np

pkg = create_serving_package("/tmp/quickstart_pkg", model, schedule,
                             state.ema_params, num_inference_steps=4,
                             quantize="int8")
pipe = ServingPipeline.from_package("/tmp/quickstart_pkg")
img = np.random.default_rng(0).integers(0, 60, (80, 120, 3), dtype=np.uint8)
enhanced = pipe(img)
print("served:", enhanced.shape, enhanced.dtype, "->", pkg["config"])

# Batched serving: a list of images runs in fixed-size padded device batches
# (one compiled program regardless of list length).
batch_out = pipe.batch([img, img, img])
print("batched:", len(batch_out), batch_out[0].shape)
