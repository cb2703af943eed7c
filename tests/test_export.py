"""Export layer tests: pre/post processing, quantization, packaging, serving."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cv_diffusion_tpu.config import diffusion_config
from cv_diffusion_tpu.models import create_model, init_model
from cv_diffusion_tpu.export import (PreProcessor, PostProcessor,
                                     quantize_bf16, quantize_int8,
                                     dequantize_int8, quantize_model,
                                     quantization_report, quantization_error,
                                     create_serving_package,
                                     load_serving_package, ServingPipeline,
                                     ServingConfig, export_stablehlo,
                                     load_stablehlo)


@pytest.fixture(scope="module")
def tiny():
    cfg = diffusion_config("tiny", image_size=32, num_inference_steps=2)
    model, schedule = create_model(cfg)
    params = init_model(model, jax.random.key(0))["params"]
    return model, schedule, params


# ---------------------------------------------------------------- preprocess

def test_preprocess_keep_aspect():
    pre = PreProcessor(64, keep_aspect=True)
    img = np.full((30, 60, 3), 200, dtype=np.uint8)
    x, meta = pre(img)
    assert x.shape == (1, 64, 64, 3)
    assert x.min() >= -1.0 and x.max() <= 1.0
    assert meta.original_size == (30, 60)
    # padded rows are zeros → normalized to -1
    assert x[0, 0, 0, 0] == pytest.approx(-1.0)
    # center rows carry image content
    assert x[0, 32, 32, 0] > 0.0


def test_pre_post_roundtrip_shape():
    pre = PreProcessor(64, keep_aspect=True)
    post = PostProcessor()
    img = np.random.default_rng(0).integers(0, 255, (48, 80, 3),
                                            dtype=np.uint8)
    x, meta = pre(img)
    out = post(x, meta)
    assert out.shape == img.shape
    assert out.dtype == np.uint8


def test_preprocess_plain_resize():
    pre = PreProcessor(64, keep_aspect=False)
    img = np.zeros((100, 50, 3), dtype=np.uint8)
    x, meta = pre(img)
    assert x.shape == (1, 64, 64, 3)
    assert meta.pad == (0, 0, 0, 0)


# --------------------------------------------------------------- quantization

def test_quantize_bf16(tiny):
    _, _, params = tiny
    # Default: full cast (norm params are upcast at compute time anyway;
    # keeping them f32 measured 2% slower on-chip — see quantize_bf16).
    q = quantize_bf16(params)
    leaves = jax.tree_util.tree_leaves(q)
    assert all(l.dtype == jnp.bfloat16 for l in leaves)
    rep = quantization_report(params, q)
    assert rep["compression"] == pytest.approx(2.0, rel=0.01)

    # Opt-in int8-style skip rules keep norm/bias/small tensors f32.
    qs = quantize_bf16(params, skip_norm_params=True)
    flat = jax.tree_util.tree_flatten_with_path(qs)[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path).lower()
        skipped = (leaf.size < 256
                   or any(s in name for s in ("norm", "bias", "scale")))
        assert leaf.dtype == (jnp.float32 if skipped else jnp.bfloat16), name


@pytest.mark.slow
def test_quantize_int8_roundtrip(tiny):
    _, _, params = tiny
    q = quantize_int8(params)
    deq = dequantize_int8(q)
    err = quantization_error(params, deq)
    assert err < 0.01  # ≤ half an int8 step relative to absmax
    rep = quantization_report(params, q)
    assert rep["compression"] > 2.5  # most weights int8, norms kept f32


def test_quantize_int8_skips_norms(tiny):
    _, _, params = tiny
    q = quantize_int8(params)
    flat = jax.tree_util.tree_flatten_with_path(q["quantized"])[0]
    for path, is_q in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path).lower()
        if "norm" in name or "bias" in name:
            assert not is_q, name


def test_quantize_model_dispatch(tiny):
    _, _, params = tiny
    _, tag = quantize_model(params, "bf16")
    assert tag == "bf16"
    _, tag = quantize_model(params, "int8")
    assert tag == "int8"
    _, tag = quantize_model(params, "none")
    assert tag == "fp32"
    with pytest.raises(ValueError):
        quantize_model(params, "int4")


# ------------------------------------------------------------------ packaging

def test_create_and_load_package(tiny, tmp_path):
    model, schedule, params = tiny
    files = create_serving_package(str(tmp_path / "pkg"), model, schedule,
                                   params, num_inference_steps=2)
    assert os.path.exists(files["config"])
    sched_npz = np.load(files["schedule"])
    np.testing.assert_array_equal(sched_npz["timesteps"], [519, 19])
    assert sched_npz["alphas_cumprod"].shape == (1000,)

    model2, schedule2, params2, cfg = load_serving_package(str(tmp_path / "pkg"))
    assert cfg["quantization"] == "fp32"
    assert model2.config.image_size == 32
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_allclose(np.asarray(a, dtype=np.float32),
                                   np.asarray(b), atol=1e-6)


def test_int8_package_roundtrip(tiny, tmp_path):
    model, schedule, params = tiny
    create_serving_package(str(tmp_path / "pkg8"), model, schedule, params,
                           num_inference_steps=2, quantize="int8")
    _, _, params2, cfg = load_serving_package(str(tmp_path / "pkg8"))
    assert cfg["quantization"] == "int8"
    err = quantization_error(params, params2)
    assert err < 0.01


# -------------------------------------------------------------------- serving

def test_serving_pipeline_end_to_end(tiny):
    model, schedule, params = tiny
    pipe = ServingPipeline(model, schedule, params,
                           ServingConfig(image_size=32,
                                         num_inference_steps=2))
    img = np.random.default_rng(0).integers(0, 60, (40, 60, 3),
                                            dtype=np.uint8)
    out = pipe(img)
    assert out.shape == (40, 60, 3)
    assert out.dtype == np.uint8


def test_serving_pipeline_commits_params_to_device(tiny):
    """load_params returns host numpy; the pipeline must device_put once at
    init or every call re-ships the full weight tree (measured 20x latency
    bug through the remote-transfer tunnel)."""
    model, schedule, params = tiny
    host_params = jax.tree_util.tree_map(np.asarray, params)
    pipe = ServingPipeline(model, schedule, host_params,
                           ServingConfig(image_size=32,
                                         num_inference_steps=2))
    assert all(isinstance(l, jax.Array)
               for l in jax.tree_util.tree_leaves(pipe.params))


@pytest.mark.slow
def test_serving_pipeline_batch(tiny):
    """batch(): fixed-size padded batches, outputs in order, uint8."""
    model, schedule, params = tiny
    pipe = ServingPipeline(model, schedule, params,
                           ServingConfig(image_size=32,
                                         num_inference_steps=2,
                                         batch_size=2))
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 60, (40, 60, 3), dtype=np.uint8)
            for _ in range(3)]  # 2 batches: [2, pad(1->2)]
    outs = pipe.batch(imgs)
    assert len(outs) == 3
    for o in outs:
        assert o.shape == (40, 60, 3) and o.dtype == np.uint8
    # deterministic given the same pipeline state
    pipe2 = ServingPipeline(model, schedule, params,
                            ServingConfig(image_size=32,
                                          num_inference_steps=2,
                                          batch_size=2))
    outs2 = pipe2.batch(imgs)
    np.testing.assert_array_equal(outs[0], outs2[0])


def test_serving_pipeline_batch_bounded_window(tiny):
    """Long lists: dispatch stays ≤ MAX_IN_FLIGHT chunks ahead of the fetch
    cursor (bounds device-resident outputs), outputs stay ordered and
    deterministic."""
    model, schedule, params = tiny
    cfg = ServingConfig(image_size=32, num_inference_steps=2, batch_size=2)
    pipe = ServingPipeline(model, schedule, params, cfg)

    dispatched = [0]
    fetched = [0]
    orig_fn, orig_post = pipe._fn, pipe.post

    def counting_fn(params, key, x):
        dispatched[0] += 1
        # invariant at every dispatch: at most MAX_IN_FLIGHT earlier chunks
        # are still unfetched (the new one makes MAX_IN_FLIGHT + 1 in
        # flight before the drain loop runs)
        assert dispatched[0] - 1 - fetched[0] <= pipe.MAX_IN_FLIGHT
        return orig_fn(params, key, x)

    pipe._fn = counting_fn

    # count fetches at chunk granularity: each drain calls post() n_valid
    # times for one chunk
    post_calls = [0]

    def chunk_counting_post(img, meta):
        post_calls[0] += 1
        fetched[0] = (post_calls[0] + cfg.batch_size - 1) // cfg.batch_size
        return orig_post(img, meta)

    pipe.post = chunk_counting_post

    rng = np.random.default_rng(2)
    imgs = [rng.integers(0, 60, (36, 44, 3), dtype=np.uint8)
            for _ in range(13)]  # 7 chunks of 2 (last one padded)
    outs = pipe.batch(imgs, seed=3)
    assert dispatched[0] == 7 and len(outs) == 13
    for o in outs:
        assert o.shape == (36, 44, 3) and o.dtype == np.uint8
    # same list, same seed → identical outputs after the rewrite
    outs_again = pipe.batch(imgs, seed=3)
    for a, b in zip(outs, outs_again):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_serving_explicit_seed_is_reproducible(tiny):
    """An explicit per-call seed must reproduce exactly, regardless of how
    many calls advanced the pipeline's internal counter before it (the
    counter used to be silently added to explicit seeds)."""
    model, schedule, params = tiny
    pipe = ServingPipeline(model, schedule, params,
                           ServingConfig(image_size=32,
                                         num_inference_steps=2,
                                         batch_size=2))
    rng = np.random.default_rng(1)
    img = rng.integers(0, 60, (40, 60, 3), dtype=np.uint8)
    a = pipe(img, seed=42)
    pipe(img)  # advances the counter
    b = pipe(img, seed=42)
    np.testing.assert_array_equal(a, b)
    # unseeded calls draw fresh noise each time
    assert not np.array_equal(pipe(img), pipe(img))
    # batch(): same explicit seed → same outputs
    imgs = [rng.integers(0, 60, (40, 60, 3), dtype=np.uint8)
            for _ in range(3)]
    np.testing.assert_array_equal(pipe.batch(imgs, seed=7)[2],
                                  pipe.batch(imgs, seed=7)[2])


def test_serving_pipeline_from_package(tiny, tmp_path):
    model, schedule, params = tiny
    create_serving_package(str(tmp_path / "pkg"), model, schedule, params,
                           num_inference_steps=2)
    pipe = ServingPipeline.from_package(
        str(tmp_path / "pkg"),
        ServingConfig(image_size=32, num_inference_steps=2))
    img = np.zeros((32, 32, 3), dtype=np.uint8)
    out = pipe(img)
    assert out.shape == (32, 32, 3)


def test_from_package_defaults_from_metadata(tiny, tmp_path):
    """Without an explicit config, from_package reads the package's own
    recorded image size and step count (model_config.json); None overrides
    are dropped, non-None overrides win — the contract the inference and
    benchmark CLIs rely on for their optional flags."""
    model, schedule, params = tiny
    create_serving_package(str(tmp_path / "pkg_meta"), model, schedule,
                           params, num_inference_steps=2)

    pipe = ServingPipeline.from_package(str(tmp_path / "pkg_meta"))
    assert pipe.config.image_size == 32          # from package metadata
    assert pipe.config.num_inference_steps == 2  # from package metadata

    pipe = ServingPipeline.from_package(
        str(tmp_path / "pkg_meta"), image_size=None,
        num_inference_steps=1, batch_size=4)
    assert pipe.config.image_size == 32          # None override dropped
    assert pipe.config.num_inference_steps == 1  # explicit override wins
    assert pipe.config.batch_size == 4


def test_serving_benchmark_stats(tiny):
    model, schedule, params = tiny
    pipe = ServingPipeline(model, schedule, params,
                           ServingConfig(image_size=32,
                                         num_inference_steps=2))
    stats = pipe.benchmark(num_runs=2, warmup=1)
    for key in ("mean_ms", "std_ms", "min_ms", "max_ms", "p50_ms",
                "preprocess_ms", "inference_ms", "per_step_ms",
                "postprocess_ms", "fps"):
        assert key in stats
        assert np.isfinite(stats[key])


# ------------------------------------------------------------------ stablehlo

def test_stablehlo_export_and_reload(tiny, tmp_path):
    model, schedule, params = tiny
    path = str(tmp_path / "sampler.stablehlo")
    blob = export_stablehlo(model, schedule, params, batch_size=1,
                            num_inference_steps=2, path=path)
    assert len(blob) > 1000
    fn = load_stablehlo(path)
    key_data = jax.random.key_data(jax.random.key(0))
    low = jnp.zeros((1, 32, 32, 3), jnp.float32)
    out = fn(params, key_data, low)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


@pytest.mark.slow
def test_stablehlo_dynamic_batch(tiny, tmp_path):
    """One dynamic-batch artifact serves b1 AND b4 (parity with the
    reference's dynamic ONNX batch axes, ``onnx_export.py:143-147``) and
    its b1 outputs match the static-batch artifact's (symbolic-dim lowering
    reorders float fusion → a few f32 ulps across the 2-step sampler, not
    bit-exact)."""
    model, schedule, params = tiny
    path = str(tmp_path / "dyn.stablehlo")
    export_stablehlo(model, schedule, params, num_inference_steps=2,
                     path=path, dynamic_batch=True)
    fn = load_stablehlo(path)
    key_data = jax.random.key_data(jax.random.key(7))
    rng = np.random.default_rng(0)
    low4 = rng.uniform(-1, 0, (4, 32, 32, 3)).astype(np.float32)

    out1 = np.asarray(fn(params, key_data, low4[:1]))
    out4 = np.asarray(fn(params, key_data, low4))
    assert out1.shape == (1, 32, 32, 3) and out4.shape == (4, 32, 32, 3)
    assert np.isfinite(out1).all() and np.isfinite(out4).all()

    static = export_stablehlo(model, schedule, params, batch_size=1,
                              num_inference_steps=2,
                              path=str(tmp_path / "static.stablehlo"))
    assert len(static) > 1000
    from jax import export as jexport
    out1_static = np.asarray(
        jexport.deserialize(static).call(params, key_data, low4[:1]))
    np.testing.assert_allclose(out1, out1_static, atol=1e-4)


@pytest.mark.slow
def test_deterministic_serving_package(tiny, tmp_path):
    """deterministic=True is recorded in model_config.json, inherited by
    from_package pipelines, and changes the sampler (renoise-free DDIM vs
    stochastic LCM) while staying seed-reproducible."""
    model, schedule, params = tiny
    files = create_serving_package(
        str(tmp_path / "pkgdet"), model, schedule, params,
        num_inference_steps=2, deterministic=True)
    with open(files["config"]) as f:
        assert json.load(f)["deterministic"] is True

    pipe_det = ServingPipeline.from_package(str(tmp_path / "pkgdet"))
    assert pipe_det.config.deterministic is True
    img = np.full((40, 40, 3), 40, np.uint8)
    a = pipe_det(img, seed=5)
    b = pipe_det(img, seed=5)
    np.testing.assert_array_equal(a, b)

    files_s = create_serving_package(
        str(tmp_path / "pkgstoch"), model, schedule, params,
        num_inference_steps=2)
    pipe_s = ServingPipeline.from_package(str(tmp_path / "pkgstoch"))
    assert pipe_s.config.deterministic is False
    c = pipe_s(img, seed=5)
    assert np.abs(a.astype(np.int32) - c.astype(np.int32)).max() > 0


@pytest.mark.slow
def test_package_dynamic_batch_graph(tiny, tmp_path):
    """create_serving_package(dynamic_batch=True) records the dynamic axis
    and ships a graph that runs at more than one batch size."""
    model, schedule, params = tiny
    files = create_serving_package(
        str(tmp_path / "pkgdyn"), model, schedule, params,
        num_inference_steps=2, include_graph=True, dynamic_batch=True)
    with open(files["config"]) as f:
        cfg = json.load(f)
    assert cfg["input"][0] == "dynamic"
    fn = load_stablehlo(files["graph"])
    key_data = jax.random.key_data(jax.random.key(0))
    for b in (1, 3):
        out = fn(params, key_data, np.zeros((b, 32, 32, 3), np.float32))
        assert out.shape == (b, 32, 32, 3)


def test_bf16_package_serves_in_bf16(tiny, tmp_path):
    import jax.numpy as jnp
    model, schedule, params = tiny
    create_serving_package(str(tmp_path / "pkgb"), model, schedule, params,
                           num_inference_steps=2, quantize="bf16")
    _, _, params2, cfg = load_serving_package(str(tmp_path / "pkgb"))
    assert cfg["quantization"] == "bf16"
    leaves = jax.tree_util.tree_leaves(params2)
    assert all(l.dtype == jnp.bfloat16 for l in leaves)


def test_compilation_cache_config(tmp_path, tiny):
    """ServingConfig.compilation_cache_dir wires up the persistent cache."""
    import jax
    from cv_diffusion_tpu.export.serving import enable_compilation_cache

    model, schedule, params = tiny
    cache = str(tmp_path / "xla-cache")
    pipe = ServingPipeline(model, schedule, params,
                           ServingConfig(image_size=32, num_inference_steps=2,
                                         compilation_cache_dir=cache))
    img = np.zeros((32, 32, 3), dtype=np.uint8)
    pipe(img)
    assert jax.config.jax_compilation_cache_dir == cache
    # cleanup for other tests (cache stays valid but unset globally)
    jax.config.update("jax_compilation_cache_dir", None)


def test_timesteps_serving_package(tiny, tmp_path):
    """A custom timestep grid (sampler-regression student deployment) is
    recorded in model_config.json + noise_schedule.npz, inherited by
    from_package pipelines, and actually drives the sampler."""
    model, schedule, params = tiny
    files = create_serving_package(
        str(tmp_path / "pkgts"), model, schedule, params, timesteps=[739])
    with open(files["config"]) as f:
        cfg = json.load(f)
    assert cfg["timesteps"] == [739]
    assert cfg["num_inference_steps"] == 1  # derived from the grid
    sched_npz = np.load(files["schedule"])
    np.testing.assert_array_equal(sched_npz["timesteps"], [739])

    pipe = ServingPipeline.from_package(str(tmp_path / "pkgts"))
    assert pipe.config.timesteps == (739,)
    img = np.full((40, 40, 3), 40, np.uint8)
    a = pipe(img, seed=5)
    assert a.shape == img.shape

    # the grid changes the output vs the stock (degenerate) 1-step grid [19]
    files_stock = create_serving_package(
        str(tmp_path / "pkgts_stock"), model, schedule, params,
        num_inference_steps=1)
    pipe_stock = ServingPipeline.from_package(str(tmp_path / "pkgts_stock"))
    b = pipe_stock(img, seed=5)
    assert np.abs(a.astype(np.int32) - b.astype(np.int32)).max() > 0
