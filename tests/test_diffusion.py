"""End-to-end diffusion model tests (tiny variant, small images, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cv_diffusion_tpu.config import diffusion_config
from cv_diffusion_tpu.models import scheduler as sched
from cv_diffusion_tpu.models.diffusion import (LowLightDiffusion, create_model,
                                               init_model, train_forward,
                                               compute_loss, diffusion_loss,
                                               enhance, normalize_image,
                                               denormalize_image)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = diffusion_config("tiny", image_size=32, num_inference_steps=4)
    model, schedule = create_model(cfg)
    variables = init_model(model, jax.random.key(0))
    return model, schedule, variables


def _batch(key, b=2, s=32):
    k1, k2 = jax.random.split(key)
    low = jax.random.uniform(k1, (b, s, s, 3), minval=-1, maxval=0)
    high = jax.random.uniform(k2, (b, s, s, 3), minval=-1, maxval=1)
    return low, high


def test_train_forward_shapes(tiny_model):
    model, schedule, variables = tiny_model
    low, high = _batch(jax.random.key(1))
    out = train_forward(model, schedule, variables, jax.random.key(2),
                        low, high)
    assert out["noise_pred"].shape == (2, 32, 32, 3)
    assert out["noise"].shape == (2, 32, 32, 3)
    assert out["timesteps"].shape == (2,)
    assert bool((out["timesteps"] >= 0).all())
    assert bool((out["timesteps"] < 1000).all())


def test_compute_loss_types(tiny_model):
    model, schedule, variables = tiny_model
    low, high = _batch(jax.random.key(1))
    for loss_type in ["mse", "huber", "l1"]:
        loss = compute_loss(model, schedule, variables, jax.random.key(2),
                            low, high, loss_type=loss_type)
        assert loss.shape == ()
        assert bool(jnp.isfinite(loss))
    with pytest.raises(ValueError):
        diffusion_loss(low, low, "nope")


def test_loss_formulas():
    pred = jnp.asarray([0.0, 2.0, -3.0])
    target = jnp.asarray([0.5, 0.0, 0.0])
    assert float(diffusion_loss(pred, target, "mse")) == pytest.approx(
        (0.25 + 4 + 9) / 3, rel=1e-6)
    assert float(diffusion_loss(pred, target, "l1")) == pytest.approx(
        (0.5 + 2 + 3) / 3, rel=1e-6)
    # huber(delta=1): 0.5·d² for |d|<1 else |d|−0.5
    assert float(diffusion_loss(pred, target, "huber")) == pytest.approx(
        (0.125 + 1.5 + 2.5) / 3, rel=1e-6)


def test_enhance_shape_and_range(tiny_model):
    model, schedule, variables = tiny_model
    low, _ = _batch(jax.random.key(3))
    out = enhance(model, schedule, variables, jax.random.key(4), low)
    assert out.shape == (2, 32, 32, 3)
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0


def test_enhance_sizes_latents_from_input(tiny_model):
    # Latent shape follows the input, not cfg.image_size (=32 here) — the
    # reference sizes latents from the input tensor.
    model, schedule, variables = tiny_model
    low = jax.random.uniform(jax.random.key(7), (1, 64, 48, 3),
                             minval=-1, maxval=0)
    out = enhance(model, schedule, variables, jax.random.key(8), low,
                  num_inference_steps=2)
    assert out.shape == (1, 64, 48, 3)


@pytest.mark.slow
def test_enhance_deterministic_given_key(tiny_model):
    model, schedule, variables = tiny_model
    low, _ = _batch(jax.random.key(3))
    a = enhance(model, schedule, variables, jax.random.key(4), low,
                num_inference_steps=2)
    b = enhance(model, schedule, variables, jax.random.key(4), low,
                num_inference_steps=2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = enhance(model, schedule, variables, jax.random.key(5), low,
                num_inference_steps=2)
    assert float(jnp.abs(a - c).max()) > 1e-5


@pytest.mark.slow
def test_enhance_deterministic_mode(tiny_model):
    """deterministic=True: same init latents → same output regardless of the
    step_noise tensor (no renoise), equals an explicit ddim_step loop, and
    differs from the stochastic sampler under the same key."""
    model, schedule, variables = tiny_model
    low, _ = _batch(jax.random.key(3), b=1)
    steps = 4
    init_noise = jax.random.normal(jax.random.key(10), (1, 32, 32, 3))
    a = enhance(model, schedule, variables, jax.random.key(0), low,
                num_inference_steps=steps, init_noise=init_noise,
                deterministic=True)
    b = enhance(model, schedule, variables, jax.random.key(99), low,
                num_inference_steps=steps, init_noise=init_noise,
                step_noise=jnp.ones((steps, 1, 32, 32, 3)),
                deterministic=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ts = sched.lcm_timesteps(steps)
    prevs = sched.prev_timesteps(ts)
    latents = init_noise.astype(jnp.dtype(model.config.unet.dtype))
    for t, pt in zip(ts, prevs):
        tv = jnp.full((1,), t, dtype=jnp.int32)
        eps = model.apply(variables, latents, low.astype(latents.dtype), tv,
                          train=False)
        latents, _ = sched.ddim_step(schedule, eps, jnp.asarray(t),
                                     jnp.asarray(pt), latents)
    looped = jnp.clip(latents, -1, 1)
    np.testing.assert_allclose(np.asarray(a, dtype=np.float32),
                               np.asarray(looped, dtype=np.float32),
                               atol=5e-4)

    stoch = enhance(model, schedule, variables, jax.random.key(0), low,
                    num_inference_steps=steps, init_noise=init_noise)
    assert float(jnp.abs(a - stoch).max()) > 1e-5


def test_enhance_scan_matches_python_loop(tiny_model):
    """The scanned sampler must equal an explicit per-step loop."""
    model, schedule, variables = tiny_model
    low, _ = _batch(jax.random.key(3), b=1)
    steps = 4
    init_noise = jax.random.normal(jax.random.key(10), (1, 32, 32, 3))
    step_noise = jax.random.normal(jax.random.key(11), (steps, 1, 32, 32, 3))

    scanned = enhance(model, schedule, variables, jax.random.key(0), low,
                      num_inference_steps=steps, init_noise=init_noise,
                      step_noise=step_noise)

    ts = sched.lcm_timesteps(steps)
    prevs = sched.prev_timesteps(ts)
    latents = init_noise
    for i, (t, pt) in enumerate(zip(ts, prevs)):
        tv = jnp.full((1,), t, dtype=jnp.int32)
        eps = model.apply(variables, latents, low, tv, train=False)
        latents, _ = sched.step(schedule, eps, jnp.asarray(t),
                                jnp.asarray(pt), latents,
                                noise=step_noise[i])
    looped = jnp.clip(latents, -1, 1)
    # XLA fuses/reorders float math differently inside scan vs eager steps;
    # each step's x̂₀ division by √ᾱ amplifies drift ~5x, so allow a few
    # float32 ulps compounded over 4 steps.
    np.testing.assert_allclose(np.asarray(scanned), np.asarray(looped),
                               atol=5e-4)


def test_enhance_intermediates(tiny_model):
    model, schedule, variables = tiny_model
    low, _ = _batch(jax.random.key(3), b=1)
    result = enhance(model, schedule, variables, jax.random.key(4), low,
                     num_inference_steps=2, return_intermediate=True)
    out, inter = result.enhanced, result.intermediate
    assert inter.shape == (2, 1, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(jnp.clip(inter[-1], -1, 1)),
                               np.asarray(out), atol=1e-6)


def test_add_condition_mode():
    cfg = diffusion_config("tiny", image_size=32, condition_mode="add")
    assert cfg.unet.in_channels == 3
    model, schedule = create_model(cfg)
    variables = init_model(model, jax.random.key(0))
    low, high = _batch(jax.random.key(1))
    loss = compute_loss(model, schedule, variables, jax.random.key(2),
                        low, high)
    assert bool(jnp.isfinite(loss))
    out = enhance(model, schedule, variables, jax.random.key(3), low,
                  num_inference_steps=2)
    assert out.shape == (2, 32, 32, 3)


def test_normalize_roundtrip():
    x = jnp.linspace(0, 1, 7)
    np.testing.assert_allclose(np.asarray(denormalize_image(normalize_image(x))),
                               np.asarray(x), atol=1e-7)
    assert float(normalize_image(jnp.asarray(0.0))) == -1.0
    assert float(normalize_image(jnp.asarray(1.0))) == 1.0


@pytest.mark.slow
def test_enhance_timesteps_override_matches_stock_grid(tiny_model):
    """Passing the stock grid explicitly must reproduce the default path
    exactly (same ts/prev_ts scan arrays, same RNG consumption)."""
    model, schedule, variables = tiny_model
    low, _ = _batch(jax.random.key(3))
    grid = sched.lcm_timesteps(4, schedule.config.num_train_timesteps,
                               schedule.config.original_inference_steps)
    a = enhance(model, schedule, variables, jax.random.key(4), low,
                num_inference_steps=4)
    b = enhance(model, schedule, variables, jax.random.key(4), low,
                timesteps=grid)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_enhance_custom_one_step_grid(tiny_model):
    """A custom high-t 1-step grid ([739]) runs one UNet call and returns
    x-hat-0 directly (prev_t == 0 terminal branch) — the deployment regime of
    a sampler-regression-distilled student."""
    model, schedule, variables = tiny_model
    low, _ = _batch(jax.random.key(3))
    out = enhance(model, schedule, variables, jax.random.key(4), low,
                  timesteps=[739])
    assert out.shape == low.shape
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0
    # differs from the stock (degenerate) 1-step grid [19]
    stock = enhance(model, schedule, variables, jax.random.key(4), low,
                    num_inference_steps=1)
    assert float(jnp.abs(out - stock).max()) > 1e-5
