"""QAT (fake-quant) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cv_diffusion_tpu.config import TrainConfig, diffusion_config
from cv_diffusion_tpu.export.qat import (fake_quant_tensor, fake_quant_params,
                                         make_qat_train_step)
from cv_diffusion_tpu.export.quantization import (quantize_int8,
                                                  dequantize_int8)
from cv_diffusion_tpu.models import create_model, init_model
from cv_diffusion_tpu.training import create_train_state


def test_fake_quant_matches_real_quant():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    fq = fake_quant_tensor(w)
    q = quantize_int8({"w": w})
    deq = dequantize_int8(q)["w"]
    np.testing.assert_allclose(np.asarray(fq), np.asarray(deq), atol=1e-6)


def test_fake_quant_gradient_is_straight_through():
    w = jnp.asarray(np.linspace(-1, 1, 256, dtype=np.float32).reshape(16, 16))

    def f(w):
        return jnp.sum(fake_quant_tensor(w) ** 2)

    g = jax.grad(f)(w)
    # STE: grad ≈ 2·fq(w) · d(scale-chain)… dominated by identity path;
    # must be finite and non-zero almost everywhere.
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_fake_quant_params_skips_norms():
    params = {
        "conv": {"kernel": jnp.ones((3, 3, 16, 16))},
        "norm1": {"scale": jnp.full((300,), 0.333)},
    }
    out = fake_quant_params(params)
    # conv kernel quantized exactly representable (all ones)
    np.testing.assert_allclose(np.asarray(out["conv"]["kernel"]), 1.0,
                               rtol=1e-6)
    # norm scale untouched bit-for-bit
    assert out["norm1"]["scale"] is params["norm1"]["scale"]


@pytest.mark.slow
def test_qat_train_step_runs():
    cfg = diffusion_config("tiny", image_size=32)
    model, schedule = create_model(cfg)
    variables = init_model(model, jax.random.key(0))
    tcfg = TrainConfig(unet_variant="tiny", image_size=32, batch_size=2,
                       epochs=1, use_ema=False)
    state = create_train_state(model, tcfg, jax.random.key(0),
                               steps_per_epoch=10, variables=variables)
    step = make_qat_train_step(model, schedule, tcfg, donate=False)
    k1, k2 = jax.random.split(jax.random.key(1))
    batch = {
        "low_light": jax.random.uniform(k1, (2, 32, 32, 3), minval=-1,
                                        maxval=0),
        "normal_light": jax.random.uniform(k2, (2, 32, 32, 3), minval=-1,
                                           maxval=1),
    }
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_calibrate_activations():
    from cv_diffusion_tpu.export import calibrate_activations
    cfg = diffusion_config("tiny", image_size=32)
    model, schedule = create_model(cfg)
    variables = init_model(model, jax.random.key(0))
    rng = np.random.default_rng(0)
    batches = [{
        "low_light": rng.uniform(-1, 0, (2, 32, 32, 3)).astype(np.float32),
        "normal_light": rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32),
    } for _ in range(2)]
    scales = calibrate_activations(model, schedule, variables, batches)
    assert len(scales) > 10          # one entry per module output
    assert all(v >= 0 for v in scales.values())
    assert any("mid_attn" in k for k in scales)


@pytest.mark.slow
def test_trainer_qat_warm_start(tmp_path):
    """End-to-end QAT fine-tune wiring (TrainConfig.qat +
    init_params_from): the Trainer warm-starts params from an existing
    checkpoint with a fresh optimizer/epoch and trains through the
    fake-quant step."""
    from PIL import Image

    from cv_diffusion_tpu.data import create_dataloaders
    from cv_diffusion_tpu.training import Trainer
    from cv_diffusion_tpu.training import checkpoint as ckpt

    rng = np.random.default_rng(0)
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(4):
        arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"n_{i}.png")

    cfg = diffusion_config("tiny", image_size=32)
    model, schedule = create_model(cfg)
    variables = init_model(model, jax.random.key(0))
    ckpt.save_params(str(tmp_path / "warm"), variables["params"])

    tcfg = TrainConfig(unet_variant="tiny", image_size=32, epochs=1,
                       batch_size=4, warmup_epochs=0, qat=True,
                       init_params_from=str(tmp_path / "warm"),
                       sample_interval=10**9, save_interval=10**9,
                       output_dir=str(tmp_path / "out"),
                       checkpoint_dir=str(tmp_path / "ckpt"))
    train_loader, _ = create_dataloaders(str(d), None, batch_size=4,
                                         image_size=32, use_synthetic=True)
    trainer = Trainer(model, schedule, train_loader, None, tcfg, mesh=None)

    # warm start actually loaded the checkpoint weights
    first = jax.tree_util.tree_leaves(variables["params"])[0]
    got = jax.tree_util.tree_leaves(trainer.state.params)[0]
    np.testing.assert_array_equal(np.asarray(first), np.asarray(got))

    trainer.train()
    assert int(trainer.state.step) == len(train_loader)
    # training moved the weights (through the STE step)
    after = jax.tree_util.tree_leaves(trainer.state.params)[0]
    assert not np.array_equal(np.asarray(first), np.asarray(after))


def test_act_fake_quant_forward_and_gradients():
    """act_quant="fake" (activation-aware QAT): same params tree as the
    float model (checkpoints interchange), forward deviates from float
    (quantization noise is actually simulated), and gradients flow through
    the STE'd activation rounds."""
    cfg_f = diffusion_config("tiny", image_size=32)
    cfg_q = diffusion_config("tiny", image_size=32, act_quant="fake")
    model_f, schedule = create_model(cfg_f)
    model_q, _ = create_model(cfg_q)
    variables = init_model(model_f, jax.random.key(0))
    vq = init_model(model_q, jax.random.key(0))
    # identical param trees — no act_scales collection in fake mode
    assert set(vq.keys()) == set(variables.keys())
    assert (jax.tree_util.tree_structure(vq["params"])
            == jax.tree_util.tree_structure(variables["params"]))

    k1, k2 = jax.random.split(jax.random.key(1))
    x = jax.random.normal(k1, (2, 32, 32, 3))
    low = jax.random.uniform(k2, (2, 32, 32, 3), minval=-1, maxval=0)
    t = jnp.full((2,), 500, jnp.int32)
    y_f = model_f.apply(variables, x, low, t, train=False)
    y_q = model_q.apply(variables, x, low, t, train=False)
    assert y_f.shape == y_q.shape
    diff = float(jnp.max(jnp.abs(y_f.astype(jnp.float32) -
                                 y_q.astype(jnp.float32))))
    assert diff > 0  # fake-quant noise present

    def loss(params):
        out = model_q.apply({"params": params}, x, low, t, train=False)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    grads = jax.grad(loss)(variables["params"])
    import optax
    gnorm = float(optax.global_norm(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_qat_act_train_step_runs():
    """TrainConfig.qat_act end-to-end: fake-quant weights (params_transform)
    + fake-quant activations (model) in one jitted step."""
    cfg = diffusion_config("tiny", image_size=32, act_quant="fake")
    model, schedule = create_model(cfg)
    variables = init_model(model, jax.random.key(0))
    # faithful_no_warmup: lr(0) would otherwise be 0 under warmup and the
    # params-moved assertion below would vacuously fail
    tcfg = TrainConfig(unet_variant="tiny", image_size=32, batch_size=2,
                       epochs=1, use_ema=False, qat_act=True,
                       faithful_no_warmup=True)
    state = create_train_state(model, tcfg, jax.random.key(0),
                               steps_per_epoch=10, variables=variables)
    step = make_qat_train_step(model, schedule, tcfg, donate=False)
    k1, k2 = jax.random.split(jax.random.key(1))
    batch = {
        "low_light": jax.random.uniform(k1, (2, 32, 32, 3), minval=-1,
                                        maxval=0),
        "normal_light": jax.random.uniform(k2, (2, 32, 32, 3), minval=-1,
                                           maxval=1),
    }
    s1, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    moved = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(s1.params)))
    assert moved
