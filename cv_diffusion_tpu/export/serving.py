"""Serving pipeline + deployable artifact export.

TPU-native replacement of the reference export/deployment stack:

* :func:`export_stablehlo` / :func:`load_stablehlo` — serialize the **entire
  jitted sampler** (UNet ×steps + scheduler, one graph) as a portable
  StableHLO artifact via ``jax.export``.  This replaces ONNX export
  (``src/export/onnx_export.py:64-175``) — and unlike the reference, the
  artifact contains the full denoising loop, not just the UNet driven by host
  code (the torch/NumPy scheduler duplication SURVEY §1 calls out).
* :class:`ServingPipeline` — end-to-end uint8→uint8 enhancement with
  aspect-preserving pre/post processing and per-stage benchmarking; equivalent
  of ``AndroidInferencePipeline`` (``src/export/android_pipeline.py:280-457``).
* :func:`create_serving_package` — params + model_config.json +
  noise_schedule.npz (ᾱ table + timestep grid) + optional StableHLO graph;
  equivalent of ``create_android_package``
  (``src/export/android_pipeline.py:460-521``).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DiffusionConfig, from_dict, to_json
from ..models.diffusion import LowLightDiffusion, enhance
from ..models.scheduler import (LCMSchedule, lcm_timesteps, make_schedule)
from ..training import checkpoint as ckpt
from .preprocess import PostProcessor, PreProcessor
from .quantization import dequantize_int8, quantize_model


@dataclass
class ServingConfig:
    """Equivalent of ``AndroidPipelineConfig``
    (``src/export/android_pipeline.py:25-53``)."""

    image_size: int = 256
    num_inference_steps: int = 4
    batch_size: int = 1
    dtype: str = "bfloat16"
    keep_aspect: bool = True
    seed: int = 0
    # Renoise-free DDIM-style sampling (scheduler.ddim_step): quality
    # improves monotonically with num_inference_steps instead of peaking
    # at ~4. Default False = reference-faithful stochastic LCM step.
    deterministic: bool = False
    # Explicit descending timestep grid overriding the stock lcm_timesteps
    # grid — required to serve sampler-regression-distilled students (their
    # 1-step grid is [739], not the degenerate stock [19]). None = stock.
    timesteps: Optional[tuple] = None
    # Persistent XLA compilation cache directory: first-process compiles of
    # the sampler take minutes on TPU; subsequent process starts reuse the
    # cached executable (None = disabled).
    compilation_cache_dir: Optional[str] = None


def enable_compilation_cache(cache_dir: str) -> None:
    """Turn on JAX's persistent compilation cache (process-wide)."""
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make_sample_fn(model: LowLightDiffusion, schedule: LCMSchedule,
                   num_inference_steps: int,
                   deterministic: bool = False,
                   timesteps: Optional[Sequence[int]] = None) -> Callable:
    """(params_or_variables, rng_key_data, low_light) → enhanced; jittable.

    Accepts either a bare params tree or a full variables dict (e.g.
    ``{"params": ..., "act_scales": ...}`` for the int8-activation path).

    ``deterministic=True`` serves the renoise-free DDIM-style sampler
    (``scheduler.ddim_step``) — quality improves monotonically with step
    count, so many-step serving configs should prefer it; the default
    stays the reference-faithful stochastic LCM step.

    ``timesteps`` overrides the stock grid (see ``enhance``) — the serving
    knob for sampler-regression-distilled students whose grid is custom
    (e.g. the 1-step ``[739]``).
    """

    def fn(params, key_data, low_light):
        variables = params if "params" in params else {"params": params}
        rng = jax.random.wrap_key_data(key_data)
        out = enhance(model, schedule, variables, rng, low_light,
                      num_inference_steps=num_inference_steps,
                      deterministic=deterministic, timesteps=timesteps)
        # float32 on device: host-side bf16→f32 conversion of the fetched
        # output costs ~50 ms/image on one core (measured).
        return out.astype(jnp.float32)

    return fn


def export_stablehlo(model: LowLightDiffusion, schedule: LCMSchedule,
                     params, batch_size: int = 1,
                     num_inference_steps: int = 4,
                     path: Optional[str] = None,
                     dynamic_batch: bool = False,
                     deterministic: bool = False,
                     timesteps: Optional[Sequence[int]] = None) -> bytes:
    """Serialize the jitted sampler to portable StableHLO bytes.

    The TPU equivalent of ``export_to_onnx`` (``onnx_export.py:64-175``) —
    verified re-loadable, like the reference's checker pass.

    ``dynamic_batch=True`` exports with a *symbolic* leading batch dimension
    (``jax.export`` shape polymorphism) — one artifact serves any batch
    size, matching the reference's dynamic ONNX batch axes
    (``onnx_export.py:143-147``).  The fixed-batch default stays because a
    static-shape graph gives the TPU compiler the tightest tiling; dynamic
    artifacts re-specialize per concrete batch at call time.
    """
    from jax import export as jexport

    size = model.config.image_size
    fn = make_sample_fn(model, schedule, num_inference_steps,
                        deterministic=deterministic, timesteps=timesteps)
    key_data = jax.random.key_data(jax.random.key(0))
    batch_dim = (jexport.symbolic_shape("b")[0] if dynamic_batch
                 else batch_size)
    args = (
        jax.tree_util.tree_map(
            lambda p: jax.ShapeDtypeStruct(p.shape, p.dtype), params),
        jax.ShapeDtypeStruct(key_data.shape, key_data.dtype),
        jax.ShapeDtypeStruct((batch_dim, size, size, 3), jnp.float32),
    )
    exported = jexport.export(jax.jit(fn))(*args)
    blob = exported.serialize()
    # Structural verification: must deserialize (parity with
    # ``onnx.checker.check_model``, ``onnx_export.py:154-169``).
    jexport.deserialize(blob)
    if path is not None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_stablehlo(path: str):
    """Load a serialized sampler; returns a callable
    (params, key_data, low_light) → enhanced."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call


def create_serving_package(output_dir: str, model: LowLightDiffusion,
                           schedule: LCMSchedule, params,
                           num_inference_steps: int = 4,
                           quantize: str = "none",
                           include_graph: bool = False,
                           batch_size: int = 1,
                           act_scales=None,
                           dynamic_batch: bool = False,
                           deterministic: bool = False,
                           timesteps: Optional[Sequence[int]] = None
                           ) -> Dict[str, str]:
    """Write a self-contained deployment package
    (``create_android_package``, ``android_pipeline.py:460-521``):

      params/                 Orbax params (optionally quantized)
      act_scales/             (int8_act) calibrated activation scales
      model_config.json       architecture + scheduler + serving config
      noise_schedule.npz      ᾱ table + timestep grid
      sampler.stablehlo       (optional) the full compiled sampling graph

    ``quantize="int8_act"`` packages the int8 *compute* path: bf16 weights +
    the calibrated ``act_scales`` collection (pass it in), served through the
    act_quant model (``export.quantization.act_quant_model``).
    """
    import dataclasses

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    files = {}

    model_cfg_out = model.config
    if quantize == "int8_act":
        if act_scales is None:
            raise ValueError(
                "int8_act packages need calibrated act_scales "
                "(export.quantization.calibrate_act_scales)")
        from .quantization import assert_calibrated
        assert_calibrated(act_scales)
        qparams, codec = quantize_model(params, "bf16")
        codec = "int8_act"
        model_cfg_out = dataclasses.replace(
            model.config,
            unet=dataclasses.replace(model.config.unet, act_quant=True))
        ckpt.save_params(str(out / "act_scales"),
                         jax.tree_util.tree_map(np.asarray, act_scales))
        files["act_scales"] = str(out / "act_scales")
    else:
        qparams, codec = quantize_model(params, quantize)
    ckpt.save_params(str(out / "params"), qparams)
    files["params"] = str(out / "params")

    if timesteps is not None:
        timesteps = [int(t) for t in timesteps]
        num_inference_steps = len(timesteps)
    cfg = {
        "model": json.loads(to_json(model_cfg_out)),
        "num_inference_steps": num_inference_steps,
        "quantization": codec,
        "input": ["dynamic" if dynamic_batch else batch_size,
                  model.config.image_size, model.config.image_size, 3],
        "deterministic": deterministic,
        "timesteps": timesteps,
        "framework": "cv_diffusion_tpu",
    }
    with open(out / "model_config.json", "w") as f:
        json.dump(cfg, f, indent=2)
    files["config"] = str(out / "model_config.json")

    ts = (timesteps if timesteps is not None
          else lcm_timesteps(num_inference_steps,
                             schedule.config.num_train_timesteps,
                             schedule.config.original_inference_steps))
    np.savez(out / "noise_schedule.npz",
             alphas_cumprod=np.asarray(schedule.alphas_cumprod),
             timesteps=np.asarray(ts, dtype=np.int32))
    files["schedule"] = str(out / "noise_schedule.npz")

    if include_graph:
        if codec == "int8_act":
            # The graph must match the package's declared compute path:
            # trace through the act_quant model with the calibrated scales
            # so the artifact executes the same int8 convs serving does.
            qmodel = LowLightDiffusion(model_cfg_out)
            graph_vars = {
                "params": qparams,
                "act_scales": jax.tree_util.tree_map(jnp.asarray,
                                                     act_scales),
            }
            export_stablehlo(qmodel, schedule, graph_vars, batch_size,
                             num_inference_steps,
                             path=str(out / "sampler.stablehlo"),
                             dynamic_batch=dynamic_batch,
                             deterministic=deterministic,
                             timesteps=timesteps)
        else:
            fp32_params = params if codec == "fp32" else (
                dequantize_int8(qparams) if codec == "int8" else qparams)
            export_stablehlo(model, schedule, fp32_params, batch_size,
                             num_inference_steps,
                             path=str(out / "sampler.stablehlo"),
                             dynamic_batch=dynamic_batch,
                             deterministic=deterministic,
                             timesteps=timesteps)
        files["graph"] = str(out / "sampler.stablehlo")
    return files


def load_serving_package(package_dir: str, use_pallas: Optional[bool] = None):
    """Rebuild (model, schedule, params) from a package directory.

    ``use_pallas``: the Pallas linear-attention kernel (whole-model win on
    v5e, never slower — BENCHMARKS.md) is enabled by default; pass False to
    force the XLA einsum path. Parameter structure is identical either way.
    """
    import dataclasses

    out = Path(package_dir)
    with open(out / "model_config.json") as f:
        cfg = json.load(f)
    model_cfg = from_dict(DiffusionConfig, cfg["model"])
    if use_pallas is None:
        use_pallas = True
    model_cfg = dataclasses.replace(
        model_cfg, unet=dataclasses.replace(model_cfg.unet,
                                            use_pallas=use_pallas))
    model = LowLightDiffusion(model_cfg)
    schedule = make_schedule(model_cfg.scheduler)

    # Restore with the right tree structure.
    var_shapes = jax.eval_shape(
        lambda k: model.init(
            {"params": k},
            jnp.zeros((1, model_cfg.image_size, model_cfg.image_size, 3),
                      jnp.dtype(model_cfg.unet.dtype)),
            jnp.zeros((1, model_cfg.image_size, model_cfg.image_size, 3),
                      jnp.dtype(model_cfg.unet.dtype)),
            jnp.zeros((1,), jnp.int32)), jax.random.key(0))
    # Host numpy zeros, NOT jnp.zeros: the target tree only supplies
    # shape/dtype to orbax, and eager jnp.zeros on the axon TPU backend is
    # one remote compile per distinct param shape (minutes of load time).
    like = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), var_shapes)["params"]

    codec = cfg.get("quantization", "fp32")
    if codec == "int8":
        # int8 packages store the quantized dict {values, scales, quantized}.
        restored = ckpt.load_params(str(out / "params"))
        params = dequantize_int8(restored)
    elif codec in ("bf16", "int8_act"):
        restored = ckpt.load_params(
            str(out / "params"),
            jax.tree_util.tree_map(
                lambda p: np.zeros(p.shape, jnp.bfloat16), like))
        params = restored  # serve in bf16 — that's the point of the codec
    else:
        params = ckpt.load_params(str(out / "params"), like)
    if codec == "int8_act":
        # model_config.json already carries unet.act_quant=True, so `model`
        # above is the int8-compute model; ship the variables dict.
        scales = ckpt.load_params(str(out / "act_scales"))
        # host numpy: ServingPipeline device_puts the whole tree once at
        # init; per-leaf eager jnp.asarray would be one tunnel transfer each.
        params = {"params": params,
                  "act_scales": jax.tree_util.tree_map(np.asarray, scales)}
    return model, schedule, params, cfg


class ServingPipeline:
    """End-to-end uint8 → uint8 enhancement
    (``AndroidInferencePipeline``, ``android_pipeline.py:280-457``)."""

    def __init__(self, model: LowLightDiffusion, schedule: LCMSchedule,
                 params, config: Optional[ServingConfig] = None):
        self.config = config or ServingConfig(
            image_size=model.config.image_size)
        if self.config.compilation_cache_dir:
            enable_compilation_cache(self.config.compilation_cache_dir)
        self.model = model
        self.schedule = schedule
        # Commit params to device ONCE. load_params returns host numpy
        # (backend-portable); leaving them host-side makes every call
        # re-transfer the full weight tree (~2.6 s/call for small-bf16
        # through the axon tunnel — measured as a 20x serving latency bug).
        self.params = jax.device_put(params)
        self.pre = PreProcessor(self.config.image_size,
                                self.config.keep_aspect,
                                normalize=False)   # device normalizes
        self.post = PostProcessor()
        from ..utils.compile_opts import tpu_compiler_options
        base_fn = make_sample_fn(model, schedule,
                                 self.config.num_inference_steps,
                                 deterministic=self.config.deterministic,
                                 timesteps=self.config.timesteps)

        def u8_fn(params, key_data, low_u8):
            # uint8 in, uint8 out: both transfer directions move 1 B/px
            # instead of f32's 4 (the fetch dominates end-to-end serving).
            # Normalize/denormalize run ON DEVICE with the same f32
            # arithmetic the host pre/post used, so results are
            # bit-identical.
            low = low_u8.astype(jnp.float32) / 127.5 - 1.0
            out = base_fn(params, key_data, low)
            return jnp.clip(out * 127.5 + 127.5, 0, 255).astype(jnp.uint8)

        self._fn = jax.jit(u8_fn, compiler_options=tpu_compiler_options())
        self._counter = 0

    @classmethod
    def from_package(cls, package_dir: str,
                     config: Optional[ServingConfig] = None,
                     use_pallas: Optional[bool] = None,
                     **overrides) -> "ServingPipeline":
        """Build a pipeline from a serving package.

        Without an explicit ``config``, the ServingConfig defaults to the
        package's own recorded image size and step count (model_config.json);
        keyword ``overrides`` replace individual fields, and None overrides
        are ignored (so CLIs can pass optional flags straight through).
        ``use_pallas`` forwards to :func:`load_serving_package` (None =
        its default, the Pallas attention kernel).
        """
        model, schedule, params, meta = load_serving_package(
            package_dir, use_pallas=use_pallas)
        if config is None:
            meta_ts = meta.get("timesteps")
            fields = dict(
                image_size=model.config.image_size,
                num_inference_steps=meta.get("num_inference_steps", 4),
                deterministic=meta.get("deterministic", False),
                timesteps=tuple(meta_ts) if meta_ts else None)
            fields.update({k: v for k, v in overrides.items()
                           if v is not None})
            config = ServingConfig(**fields)
        return cls(model, schedule, params, config)

    def _next_key(self, seed: Optional[int]):
        """Explicit seed → fully deterministic (same seed, same output);
        no seed → config.seed advanced by a per-call counter (fresh noise
        each call, the reference's unseeded-randn behavior)."""
        if seed is None:
            seed = self.config.seed + self._counter
            self._counter += 1
        return jax.random.key_data(jax.random.key(seed))

    def __call__(self, image_u8: np.ndarray,
                 seed: Optional[int] = None) -> np.ndarray:
        """Enhance one uint8 HWC image (``android_pipeline.py:336-389``)."""
        x, meta = self.pre(image_u8)
        key_data = self._next_key(seed)
        out = self._fn(self.params, key_data, jnp.asarray(x))
        return self.post(np.asarray(out), meta)

    # Chunks kept in flight ahead of the fetch cursor: k=2 keeps the device
    # busy (dispatch is async; the device samples chunk N+1/N+2 while the
    # host fetches/postprocesses chunk N) while bounding device-resident
    # outputs at k+1 batches — an unbounded window grows ~196 KB/image at
    # 256² (≈2 GB for a 10k-image folder) next to the sampler's temporaries.
    MAX_IN_FLIGHT = 2

    def batch(self, images, seed: Optional[int] = None):
        """Enhance a list of uint8 HWC images in fixed-size device batches.

        The reference pipeline is single-image
        (``android_pipeline.py:336-389``); on an accelerator the throughput
        sweet spot is batched, so this pads the final partial batch to
        ``config.batch_size`` (one compiled program regardless of list
        length), pipelines dispatch ``MAX_IN_FLIGHT`` chunks ahead of the
        host-side fetch/postprocess, and returns uint8 arrays in input order.
        """
        bs = max(1, self.config.batch_size)
        in_flight = []
        outs = []

        def drain_one():
            out, metas, n_valid = in_flight.pop(0)
            host = np.asarray(out)                        # uint8, 1 B/px
            for i in range(n_valid):
                outs.append(self.post(host[i:i + 1], metas[i]))

        for chunk_idx, start in enumerate(range(0, len(images), bs)):
            chunk = images[start:start + bs]
            pre = [self.pre(img) for img in chunk]
            x = np.stack([p[0][0] for p in pre])          # [n, S, S, 3]
            n_valid = x.shape[0]
            if n_valid < bs:                              # pad, same program
                x = np.concatenate(
                    [x, np.zeros((bs - n_valid,) + x.shape[1:], x.dtype)])
            # Explicit seed: deterministic per chunk (seed + chunk index),
            # so the same call reproduces exactly; None: per-call counter.
            key_data = self._next_key(
                None if seed is None else seed + chunk_idx)
            out = self._fn(self.params, key_data, jnp.asarray(x))
            in_flight.append((out, [p[1] for p in pre], n_valid))
            while len(in_flight) > self.MAX_IN_FLIGHT:
                drain_one()                               # fetch chunk N-k
        while in_flight:
            drain_one()
        return outs

    def benchmark(self, num_runs: int = 20, warmup: int = 3
                  ) -> Dict[str, float]:
        """Per-stage latency benchmark
        (``android_pipeline.py:391-457``): pre / device / post + totals."""
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)

        for _ in range(warmup):
            self(img)

        pre_t, dev_t, post_t, tot_t = [], [], [], []
        for i in range(num_runs):
            t0 = time.perf_counter()
            x, meta = self.pre(img)
            t1 = time.perf_counter()
            key_data = jax.random.key_data(jax.random.key(i))
            out = self._fn(self.params, key_data, jnp.asarray(x))
            out.block_until_ready()
            t2 = time.perf_counter()
            self.post(np.asarray(out), meta)
            t3 = time.perf_counter()
            pre_t.append(t1 - t0)
            dev_t.append(t2 - t1)
            post_t.append(t3 - t2)
            tot_t.append(t3 - t0)

        arr = np.asarray(tot_t) * 1000
        return {
            "mean_ms": float(arr.mean()),
            "std_ms": float(arr.std()),
            "min_ms": float(arr.min()),
            "max_ms": float(arr.max()),
            "p50_ms": float(np.percentile(arr, 50)),
            "preprocess_ms": float(np.mean(pre_t) * 1000),
            "inference_ms": float(np.mean(dev_t) * 1000),
            "per_step_ms": float(np.mean(dev_t) * 1000 /
                                 self.config.num_inference_steps),
            "postprocess_ms": float(np.mean(post_t) * 1000),
            "fps": float(1000.0 / arr.mean()),
        }
