"""int8 activation-compute path: calibration, execution, accuracy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cv_diffusion_tpu.config import diffusion_config
from cv_diffusion_tpu.export.quantization import (act_quant_model,
                                                  assert_calibrated,
                                                  calibrate_act_scales)
from cv_diffusion_tpu.models.diffusion import (create_model, enhance,
                                               init_model)


@pytest.fixture(scope="module")
def setup():
    cfg = diffusion_config("tiny", image_size=32, num_inference_steps=4)
    model, schedule = create_model(cfg)
    variables = init_model(model, jax.random.key(0))
    qmodel, _ = act_quant_model(cfg)
    return cfg, model, schedule, variables["params"], qmodel


def _batches(n, b=2, s=32):
    out = []
    for i in range(n):
        k1, k2 = jax.random.split(jax.random.key(i))
        out.append({
            "low_light": jax.random.uniform(k1, (b, s, s, 3),
                                            minval=-1, maxval=0),
            "normal_light": jax.random.uniform(k2, (b, s, s, 3),
                                               minval=-1, maxval=1),
        })
    return out


@pytest.mark.slow
def test_params_are_structurally_identical(setup):
    cfg, model, schedule, params, qmodel = setup
    qvars = init_model(qmodel, jax.random.key(0))
    fs = jax.tree_util.tree_structure(params)
    qs = jax.tree_util.tree_structure(qvars["params"])
    assert fs == qs  # float checkpoints load directly into the int8 model


def test_static_bounds_prepopulated(setup):
    cfg, model, schedule, params, qmodel = setup
    qvars = init_model(qmodel, jax.random.key(0))
    scales = qvars["act_scales"]
    flat = jax.tree_util.tree_flatten_with_path(scales)[0]
    names = {"/".join(str(getattr(p, "key", p)) for p in path): float(v)
             for path, v in flat}
    # ReLU6-bounded sites (expand / depthwise) carry the static 6.0 bound.
    bound = [v for k, v in names.items()
             if k.endswith("expand/amax") or k.endswith("depthwise/amax")]
    assert bound and all(v == 6.0 for v in bound)
    # project / init_conv etc. need calibration (start at 0).
    calib = [v for k, v in names.items() if k.endswith("project/amax")]
    assert calib and all(v == 0.0 for v in calib)


def test_assert_calibrated_raises_before_calibration(setup):
    cfg, model, schedule, params, qmodel = setup
    qvars = init_model(qmodel, jax.random.key(0))
    with pytest.raises(ValueError, match="uncalibrated"):
        assert_calibrated(qvars["act_scales"])


@pytest.mark.slow
def test_calibration_and_int8_forward_accuracy(setup):
    cfg, model, schedule, params, qmodel = setup
    scales = calibrate_act_scales(qmodel, schedule, params, _batches(3))
    assert_calibrated(scales)

    low = _batches(1)[0]["low_light"]
    out_f = enhance(model, schedule, {"params": params}, jax.random.key(5),
                    low, num_inference_steps=2)
    out_q = enhance(qmodel, schedule,
                    {"params": params, "act_scales": scales},
                    jax.random.key(5), low, num_inference_steps=2)
    assert out_q.shape == out_f.shape
    assert np.isfinite(np.asarray(out_q, np.float32)).all()
    # int8 is a lossy path, but outputs must stay close on the same noise.
    err = float(jnp.mean(jnp.abs(out_q.astype(jnp.float32)
                                 - out_f.astype(jnp.float32))))
    assert err < 0.15, f"int8 sampler diverged from float: MAE {err:.3f}"


def test_uncalibrated_modules_fall_back_to_dynamic_scales(setup):
    """An act_quant model applied WITHOUT calibration must not saturate:
    modules still at amax==0 fall back to a dynamic per-batch scale (the
    reference's dynamic-quantization semantics) instead of quantizing
    against a degenerate 1e-6 amax."""
    cfg, model, schedule, params, qmodel = setup
    qvars = init_model(qmodel, jax.random.key(0))  # uncalibrated scales

    low = _batches(1)[0]["low_light"]
    out_f = enhance(model, schedule, {"params": params}, jax.random.key(5),
                    low, num_inference_steps=2)
    out_q = enhance(qmodel, schedule,
                    {"params": params, "act_scales": qvars["act_scales"]},
                    jax.random.key(5), low, num_inference_steps=2)
    assert np.isfinite(np.asarray(out_q, np.float32)).all()
    err = float(jnp.mean(jnp.abs(out_q.astype(jnp.float32)
                                 - out_f.astype(jnp.float32))))
    assert err < 0.15, f"uncalibrated int8 diverged from float: MAE {err:.3f}"


@pytest.mark.slow
def test_int8_act_serving_package_roundtrip(setup, tmp_path):
    from cv_diffusion_tpu.export.serving import (create_serving_package,
                                                 load_serving_package,
                                                 make_sample_fn)

    cfg, model, schedule, params, qmodel = setup
    scales = calibrate_act_scales(qmodel, schedule, params, _batches(2))
    files = create_serving_package(str(tmp_path / "pkg"), model, schedule,
                                   params, num_inference_steps=2,
                                   quantize="int8_act", act_scales=scales)
    assert "act_scales" in files

    model2, schedule2, variables, meta = load_serving_package(
        str(tmp_path / "pkg"))
    assert meta["quantization"] == "int8_act"
    assert model2.config.unet.act_quant
    assert "act_scales" in variables

    fn = jax.jit(make_sample_fn(model2, schedule2, 2))
    low = _batches(1)[0]["low_light"]
    key_data = jax.random.key_data(jax.random.key(0))
    out = fn(variables, key_data, jnp.asarray(low))
    assert out.shape == low.shape
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_int8_act_graph_traces_int8_compute(setup, tmp_path):
    """include_graph on an int8_act package must serialize the QUANTIZED
    sampler (traced through the act_quant model with the calibrated
    scales), not a float graph mislabeled as int8 — the artifact must
    reproduce the serving path's numerics."""
    from cv_diffusion_tpu.export.serving import (create_serving_package,
                                                 load_serving_package,
                                                 load_stablehlo,
                                                 make_sample_fn)

    cfg, model, schedule, params, qmodel = setup
    scales = calibrate_act_scales(qmodel, schedule, params, _batches(2))
    files = create_serving_package(str(tmp_path / "pkg_g"), model, schedule,
                                   params, num_inference_steps=2,
                                   quantize="int8_act", act_scales=scales,
                                   include_graph=True, batch_size=2)
    assert "graph" in files

    model2, schedule2, variables, meta = load_serving_package(
        str(tmp_path / "pkg_g"))
    low = _batches(1)[0]["low_light"]
    key_data = jax.random.key_data(jax.random.key(0))
    served = make_sample_fn(model2, schedule2, 2)(variables, key_data,
                                                  jnp.asarray(low))
    graph_fn = load_stablehlo(files["graph"])
    graph_vars = {"params": variables["params"],
                  "act_scales": variables["act_scales"]}
    from_graph = graph_fn(graph_vars, key_data, jnp.asarray(low))
    # Mean-gap assertion, not elementwise atol: the deserialized StableHLO
    # and the freshly-traced program compile with different fp reduction
    # orders (threading/tiling varies with the virtual device count), and a
    # pre-quantize activation sitting on an int8 rounding edge can flip a
    # level — isolated elementwise spikes of ~0.03 are compilation noise.
    # The property under test is that the graph runs the QUANTIZED sampler:
    # a float graph mislabeled as int8 differs from the served int8 path by
    # MAE ≈ 0.044 (BENCHMARKS.md int8-activation table), two orders above
    # the ≈1e-3 cross-compilation noise this bound allows.
    diff = np.abs(np.asarray(from_graph, np.float32)
                  - np.asarray(served, np.float32))
    assert diff.mean() < 0.01, f"graph/serving MAE {diff.mean():.4f}"
    assert diff.max() < 0.15, f"graph/serving max diff {diff.max():.4f}"


def test_int8_act_package_requires_scales(setup, tmp_path):
    from cv_diffusion_tpu.export.serving import create_serving_package

    cfg, model, schedule, params, qmodel = setup
    with pytest.raises(ValueError, match="act_scales"):
        create_serving_package(str(tmp_path / "pkg2"), model, schedule,
                               params, quantize="int8_act")


def test_calibration_scales_grow_monotonically(setup):
    cfg, model, schedule, params, qmodel = setup
    s1 = calibrate_act_scales(qmodel, schedule, params, _batches(1))
    s3 = calibrate_act_scales(qmodel, schedule, params, _batches(3))
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s3)):
        assert float(b) >= float(a) - 1e-6
