"""Consistency-distillation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax

from cv_diffusion_tpu.config import diffusion_config
from cv_diffusion_tpu.models import (create_model, init_model,
                                     create_distillation_state,
                                     make_distillation_step,
                                     consistency_loss, huber_loss,
                                     sample_timestep_pairs)
from cv_diffusion_tpu.models.distillation import consistency_distillation_loss


@pytest.fixture(scope="module")
def setup():
    cfg = diffusion_config("tiny", image_size=32)
    model, schedule = create_model(cfg)
    teacher = init_model(model, jax.random.key(0))["params"]
    student = init_model(model, jax.random.key(1))["params"]
    return model, schedule, teacher, student


def _batch(key, b=2, s=32):
    k1, k2 = jax.random.split(key)
    return {
        "low_light": jax.random.uniform(k1, (b, s, s, 3), minval=-1, maxval=0),
        "normal_light": jax.random.uniform(k2, (b, s, s, 3), minval=-1,
                                           maxval=1),
    }


def test_loss_utilities():
    a = jnp.asarray([1.0, 2.0])
    b = jnp.asarray([1.5, 0.0])
    assert float(consistency_loss(a, b)) == pytest.approx(
        (0.25 + 4.0) / 2, rel=1e-6)
    # huber delta=1: 0.5·0.25 and (2 − 0.5)
    assert float(huber_loss(a, b)) == pytest.approx(
        (0.125 + 1.5) / 2, rel=1e-6)


def test_timestep_pairs_grid():
    t, t_next = sample_timestep_pairs(jax.random.key(0), 128,
                                      num_train_timesteps=1000,
                                      num_ddim_timesteps=50,
                                      num_inference_steps=4)
    t = np.asarray(t)
    t_next = np.asarray(t_next)
    assert ((t % 20) == 19).all()
    np.testing.assert_array_equal(t_next - t, 240)  # k=12 grid steps × c=20
    # t_next is the *more-noised* point — reference behavior kept
    # (``low_light_diffusion.py:350-351``).
    assert (t_next > t).all()
    # terminal zero-SNR grid point excluded (x̂₀ singular at ᾱ=0)
    assert t_next.max() <= 979


def test_canonical_pairs_grid():
    from cv_diffusion_tpu.models.distillation import sample_canonical_pairs
    t, t_prev = sample_canonical_pairs(jax.random.key(0), 128,
                                       num_train_timesteps=1000,
                                       num_ddim_timesteps=50,
                                       num_inference_steps=4)
    t = np.asarray(t)
    t_prev = np.asarray(t_prev)
    assert ((t % 20) == 19).all()
    np.testing.assert_array_equal(t - t_prev, 240)
    # canonical LCM: the EMA target sits CLOSER to data
    assert (t_prev < t).all()
    assert t_prev.min() >= 19  # never below the first DDIM grid point
    assert t.max() <= 979      # terminal zero-SNR point excluded


def test_canonical_distillation_loss_finite(setup):
    model, schedule, teacher, student = setup
    batch = _batch(jax.random.key(2))
    loss = consistency_distillation_loss(
        model, schedule, teacher, student, student, jax.random.key(3),
        batch["low_light"], batch["normal_light"], canonical=True)
    assert np.isfinite(float(loss))
    assert float(loss) >= 0


def test_distillation_loss_finite(setup):
    model, schedule, teacher, student = setup
    batch = _batch(jax.random.key(2))
    loss = consistency_distillation_loss(
        model, schedule, teacher, student, student, jax.random.key(3),
        batch["low_light"], batch["normal_light"])
    assert np.isfinite(float(loss))
    assert float(loss) >= 0


def test_distillation_loss_zero_when_student_is_target_far_noised(setup):
    """Student == EMA student with identical inputs isn't zero (different
    timesteps), but loss must be small when teacher step is identity-ish."""
    model, schedule, teacher, student = setup
    batch = _batch(jax.random.key(2))
    l1 = consistency_distillation_loss(
        model, schedule, teacher, student, student, jax.random.key(3),
        batch["low_light"], batch["normal_light"])
    l2 = consistency_distillation_loss(
        model, schedule, teacher, student, teacher, jax.random.key(3),
        batch["low_light"], batch["normal_light"])
    # changing the EMA target changes the loss — it is actually used
    assert float(l1) != float(l2)


@pytest.mark.slow
def test_distillation_step_trains_student_only(setup):
    model, schedule, teacher, student = setup
    tx = optax.adamw(1e-4)
    state = create_distillation_state(teacher, student, tx, jax.random.key(0))
    step = make_distillation_step(model, schedule, donate=False)
    batch = _batch(jax.random.key(1))

    s1, m1 = step(state, batch)
    assert np.isfinite(float(m1["loss"]))
    assert int(s1.step) == 1

    # teacher frozen
    for a, b in zip(jax.tree_util.tree_leaves(state.teacher_params),
                    jax.tree_util.tree_leaves(s1.teacher_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # student moved
    moved = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(jax.tree_util.tree_leaves(state.student_params),
                        jax.tree_util.tree_leaves(s1.student_params)))
    assert moved
    # EMA student strictly between old and new student
    e = jax.tree_util.tree_leaves(s1.ema_student_params)[0]
    old = jax.tree_util.tree_leaves(state.student_params)[0]
    new = jax.tree_util.tree_leaves(s1.student_params)[0]
    assert float(jnp.abs(e - old).max()) > 0
    assert float(jnp.abs(e - new).max()) > 0


@pytest.mark.slow
def test_ema_decay_095_semantics(setup):
    """Distillation EMA decay is 0.95 (``lcm_scheduler.py:323``), far faster
    than the trainer's 0.9999."""
    model, schedule, teacher, student = setup
    tx = optax.sgd(1.0)
    state = create_distillation_state(teacher, student, tx, jax.random.key(0))
    step = make_distillation_step(model, schedule, ema_decay=0.95,
                                  donate=False)
    s1, _ = step(state, _batch(jax.random.key(1)))
    e = jax.tree_util.tree_leaves(s1.ema_student_params)[0]
    old = jax.tree_util.tree_leaves(state.student_params)[0]
    new = jax.tree_util.tree_leaves(s1.student_params)[0]
    np.testing.assert_allclose(np.asarray(e),
                               np.asarray(old * 0.95 + new * 0.05),
                               rtol=1e-4, atol=1e-6)


def test_canonical_pairs_stride_one():
    from cv_diffusion_tpu.models.distillation import sample_canonical_pairs
    t, t_prev = sample_canonical_pairs(jax.random.key(0), 128,
                                       num_train_timesteps=1000,
                                       num_ddim_timesteps=50,
                                       num_inference_steps=4, stride=1)
    t, t_prev = np.asarray(t), np.asarray(t_prev)
    np.testing.assert_array_equal(t - t_prev, 20)  # adjacent grid points
    assert t_prev.min() >= 19 and t.max() <= 979


def test_distillation_loss_with_dropout_model():
    """The student apply runs train=True; a model with dropout > 0 needs a
    dropout RNG or flax raises InvalidRngError on the first step."""
    cfg = diffusion_config("tiny", image_size=32, dropout=0.1)
    model, schedule = create_model(cfg)
    teacher = init_model(model, jax.random.key(0))["params"]
    b = _batch(jax.random.key(3))
    loss = consistency_distillation_loss(
        model, schedule, teacher, teacher, teacher, jax.random.key(4),
        b["low_light"], b["normal_light"])
    assert np.isfinite(float(loss))


def test_sampler_matched_loss_finite(setup):
    model, schedule, teacher, student = setup
    batch = _batch(jax.random.key(2))
    loss = consistency_distillation_loss(
        model, schedule, teacher, student, student, jax.random.key(3),
        batch["low_light"], batch["normal_light"], sampler_matched=True)
    assert np.isfinite(float(loss))
    assert float(loss) >= 0


@pytest.mark.slow
def test_sampler_regression_loss_finite_and_gt_anchor(setup):
    from cv_diffusion_tpu.models.distillation import sampler_regression_loss
    model, schedule, teacher, student = setup
    batch = _batch(jax.random.key(5))
    base = sampler_regression_loss(
        model, schedule, teacher, student, jax.random.key(6),
        batch["low_light"], batch["normal_light"],
        teacher_steps=2, student_timesteps=(739,))
    assert np.isfinite(float(base)) and float(base) >= 0
    # the ground-truth anchor actually mixes in
    anchored = sampler_regression_loss(
        model, schedule, teacher, student, jax.random.key(6),
        batch["low_light"], batch["normal_light"],
        teacher_steps=2, student_timesteps=(739,), gt_weight=1.0)
    assert float(anchored) != float(base)
    # deterministic-teacher variant changes the target
    det = sampler_regression_loss(
        model, schedule, teacher, student, jax.random.key(6),
        batch["low_light"], batch["normal_light"],
        teacher_steps=2, student_timesteps=(739,),
        deterministic_teacher=True)
    assert np.isfinite(float(det))
    assert float(det) != float(base)


@pytest.mark.slow
def test_regression_step_trains_student_only(setup):
    from cv_diffusion_tpu.models import make_regression_distillation_step
    model, schedule, teacher, student = setup
    tx = optax.adamw(1e-4)
    state = create_distillation_state(teacher, student, tx, jax.random.key(0))
    step = make_regression_distillation_step(
        model, schedule, teacher_steps=2, student_timesteps=(739,),
        donate=False)
    batch = _batch(jax.random.key(1))

    s1, m1 = step(state, batch)
    assert np.isfinite(float(m1["loss"]))
    assert float(m1["grad_norm"]) > 0  # grads flow through the student sampler
    assert int(s1.step) == 1

    # teacher frozen
    for a, b in zip(jax.tree_util.tree_leaves(state.teacher_params),
                    jax.tree_util.tree_leaves(s1.teacher_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # student moved
    moved = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(jax.tree_util.tree_leaves(state.student_params),
                        jax.tree_util.tree_leaves(s1.student_params)))
    assert moved


@pytest.mark.slow
def test_regression_multistep_stopgrad_prefix(setup):
    """m>1 regression grids default to the stop-grad-prefix student sampler
    (full-scan backprop measured 42 GiB at b16 on the 15.75 GiB chip):
    loss finite, gradients flow through the final step, and full_grad=True
    still computes a finite loss (the memory-rich backend path)."""
    from cv_diffusion_tpu.models.distillation import sampler_regression_loss
    model, schedule, teacher, student = setup
    batch = _batch(jax.random.key(7))

    def loss(p, full_grad):
        return sampler_regression_loss(
            model, schedule, teacher, p, jax.random.key(8),
            batch["low_light"], batch["normal_light"],
            teacher_steps=2, student_timesteps=(739, 259),
            full_grad=full_grad)

    val, grads = jax.value_and_grad(lambda p: loss(p, False))(student)
    assert np.isfinite(float(val)) and float(val) >= 0
    gnorm = float(optax.global_norm(grads))
    assert np.isfinite(gnorm) and gnorm > 0

    full = float(loss(student, True))
    assert np.isfinite(full)


@pytest.mark.slow
def test_regression_asymmetric_teacher_model(setup):
    """Capacity-asymmetric distillation: a SMALL-variant student can train
    under a TINY-variant teacher — the regression objective couples the two
    only through sampler outputs, so architectures are independent (this is
    the 'bigger student' lever for the 1-step serving frontier)."""
    from cv_diffusion_tpu.models import make_regression_distillation_step
    teacher_model, schedule, teacher, _ = setup
    s_cfg = diffusion_config("small", image_size=32)
    student_model, _ = create_model(s_cfg)
    student = init_model(student_model, jax.random.key(2))["params"]

    tx = optax.adamw(1e-4)
    state = create_distillation_state(teacher, student, tx, jax.random.key(0))
    step = make_regression_distillation_step(
        student_model, schedule, teacher_steps=2, student_timesteps=(739,),
        teacher_model=teacher_model, donate=False)
    s1, m1 = step(state, _batch(jax.random.key(3)))
    assert np.isfinite(float(m1["loss"]))
    assert float(m1["grad_norm"]) > 0
    # teacher (tiny tree) frozen; student (small tree) moved
    for a, b in zip(jax.tree_util.tree_leaves(state.teacher_params),
                    jax.tree_util.tree_leaves(s1.teacher_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    moved = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(jax.tree_util.tree_leaves(state.student_params),
                        jax.tree_util.tree_leaves(s1.student_params)))
    assert moved


def test_distillation_trainer_rejects_asymmetric_consistency():
    """Adjacent-pair consistency requires same-arch teacher/student."""
    from cv_diffusion_tpu.training import DistillationTrainer
    cfg = diffusion_config("tiny", image_size=32)
    model, schedule = create_model(cfg)
    with pytest.raises(ValueError, match="regression"):
        DistillationTrainer(model, schedule, teacher_params={},
                            train_loader=[], regression=False,
                            teacher_model=object())
