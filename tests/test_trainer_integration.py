"""End-to-end Trainer integration: tiny model, synthetic data, 2 epochs."""

import os
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow
from PIL import Image

from cv_diffusion_tpu.config import TrainConfig, diffusion_config
from cv_diffusion_tpu.data import create_dataloaders
from cv_diffusion_tpu.models import create_model
from cv_diffusion_tpu.training import Trainer


@pytest.fixture()
def flat_dir(tmp_path):
    rng = np.random.default_rng(0)
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(8):
        arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"n_{i}.png")
    return d


def test_trainer_end_to_end(flat_dir, tmp_path):
    cfg = TrainConfig(
        unet_variant="tiny", image_size=32, epochs=2, batch_size=4,
        warmup_epochs=0, save_interval=1, sample_interval=1, use_ema=True,
        output_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    train_loader, _ = create_dataloaders(str(flat_dir), None, batch_size=4,
                                         image_size=32, use_synthetic=True)
    model, schedule = create_model(
        diffusion_config("tiny", image_size=32))
    trainer = Trainer(model, schedule, train_loader, None, cfg, mesh=None)
    trainer.train()

    # checkpoints written (periodic + final)
    assert (tmp_path / "ckpt" / "checkpoint_epoch_0").exists()
    assert (tmp_path / "ckpt" / "checkpoint_epoch_1").exists()
    assert (tmp_path / "ckpt" / "final_model").exists()
    # sample grids written every epoch
    assert (tmp_path / "out" / "samples_epoch_0.png").exists()
    assert (tmp_path / "out" / "samples_epoch_1.png").exists()
    # grid is 3 rows (low/enhanced/target) × num_samples cols
    grid = np.array(Image.open(tmp_path / "out" / "samples_epoch_0.png"))
    assert grid.shape == (3 * 32, 4 * 32, 3)
    assert int(trainer.state.step) == 2 * len(train_loader)


def test_evaluate_quality_respects_step_count(flat_dir, tmp_path):
    """evaluate_quality(num_inference_steps=k) must actually sample with k
    steps (it used to silently run a hardcoded 4); the default follows
    TrainConfig.num_inference_steps."""
    cfg = TrainConfig(
        unet_variant="tiny", image_size=32, epochs=1, batch_size=4,
        num_inference_steps=4, warmup_epochs=0,
        output_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"))
    train_loader, _ = create_dataloaders(str(flat_dir), None, batch_size=4,
                                         image_size=32, use_synthetic=True)
    model, schedule = create_model(diffusion_config("tiny", image_size=32))
    trainer = Trainer(model, schedule, train_loader,
                      val_loader=train_loader, config=cfg, mesh=False)

    m2 = trainer.evaluate_quality(num_inference_steps=2, max_batches=1)
    assert set(trainer._enhance_cache) == {2}  # compiled FOR 2 steps
    m4 = trainer.evaluate_quality(max_batches=1)  # config default
    assert set(trainer._enhance_cache) == {2, 4}
    for m in (m2, m4):
        assert np.isfinite(m["psnr"]) and np.isfinite(m["ssim"])


def test_trainer_resume(flat_dir, tmp_path):
    cfg = TrainConfig(
        unet_variant="tiny", image_size=32, epochs=1, batch_size=4,
        warmup_epochs=0, save_interval=1, sample_interval=100, use_ema=True,
        output_dir=str(tmp_path / "out"), checkpoint_dir=str(tmp_path / "ckpt"))
    train_loader, _ = create_dataloaders(str(flat_dir), None, batch_size=4,
                                         image_size=32, use_synthetic=True)
    model, schedule = create_model(diffusion_config("tiny", image_size=32))
    t1 = Trainer(model, schedule, train_loader, None, cfg, mesh=None)
    t1.train()
    steps_after_1 = int(t1.state.step)

    cfg2 = TrainConfig(
        unet_variant="tiny", image_size=32, epochs=2, batch_size=4,
        warmup_epochs=0, save_interval=100, sample_interval=100, use_ema=True,
        output_dir=str(tmp_path / "out"), checkpoint_dir=str(tmp_path / "ck2"),
        resume_from=str(tmp_path / "ckpt" / "final_model"))
    t2 = Trainer(model, schedule, train_loader, None, cfg2, mesh=None)
    # resume continues at epoch + 1
    assert t2.epoch == 1
    assert int(t2.state.step) == steps_after_1
    t2.train()
    assert int(t2.state.step) == steps_after_1 + len(train_loader)


def test_validation_and_quality_eval(flat_dir, tmp_path):
    cfg = TrainConfig(
        unet_variant="tiny", image_size=32, epochs=1, batch_size=4,
        warmup_epochs=0, save_interval=100, sample_interval=100,
        output_dir=str(tmp_path / "out"), checkpoint_dir=str(tmp_path / "ckpt"))
    train_loader, _ = create_dataloaders(str(flat_dir), None, batch_size=4,
                                         image_size=32, use_synthetic=True)
    model, schedule = create_model(diffusion_config("tiny", image_size=32))
    trainer = Trainer(model, schedule, train_loader, train_loader, cfg,
                      mesh=None)
    val = trainer.validate()
    assert np.isfinite(val)
    q = trainer.evaluate_quality(num_inference_steps=2, max_batches=1)
    assert 0 < q["psnr"] < 60
    assert -1 <= q["ssim"] <= 1


def test_distillation_best_student_selection(flat_dir, tmp_path):
    """DistillationTrainer tracks full-sampler val PSNR per epoch and keeps a
    best_student checkpoint; ragged val batches take the host-pad path (7
    images, batch 4)."""
    import jax
    from cv_diffusion_tpu.models import init_model
    from cv_diffusion_tpu.training import DistillationTrainer
    from cv_diffusion_tpu.training import checkpoint as ckpt

    cfg = TrainConfig(
        unet_variant="tiny", image_size=32, epochs=2, batch_size=4,
        num_inference_steps=2, warmup_epochs=0, save_interval=100,
        sample_interval=100, output_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"))
    train_loader, _ = create_dataloaders(str(flat_dir), None, batch_size=4,
                                         image_size=32, use_synthetic=True)
    # 7-image val set -> one full batch + one ragged 3-image batch
    from cv_diffusion_tpu.data import DataLoader, SyntheticLowLightDataset
    val_ds = SyntheticLowLightDataset(str(flat_dir), image_size=32)
    val_ds.images = val_ds.images[:7]
    val_loader = DataLoader(val_ds, 4)
    model, schedule = create_model(diffusion_config("tiny", image_size=32))
    teacher = init_model(model, jax.random.key(0))["params"]
    trainer = DistillationTrainer(model, schedule, teacher, train_loader,
                                  val_loader=val_loader, config=cfg,
                                  mesh=False, canonical=True)
    trainer.train()

    assert np.isfinite(trainer.best_val_psnr)
    best = tmp_path / "ckpt" / "best_student"
    final = tmp_path / "ckpt" / "student_final"
    assert best.exists() and final.exists()
    # the best checkpoint round-trips through the params loader.  NB: the
    # donated distillation step consumed the original `teacher` arrays, so
    # the shape tree must come from eval_shape, not from `teacher`.
    shapes = jax.eval_shape(
        lambda k: init_model(model, k), jax.random.key(0))["params"]
    like = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes)
    restored = ckpt.load_inference_params(str(best), like)
    assert jax.tree_util.tree_structure(
        restored) == jax.tree_util.tree_structure(like)

    # Warm start (staged distillation): a new trainer seeded from the saved
    # student starts from THOSE weights, not a fresh teacher copy.
    teacher2 = init_model(model, jax.random.key(1))["params"]
    t2 = DistillationTrainer(model, schedule, teacher2, train_loader,
                             config=cfg, mesh=False, canonical=True,
                             student_params=restored)
    leaf = lambda tree: jax.tree_util.tree_leaves(tree)[0]
    np.testing.assert_array_equal(
        np.asarray(leaf(t2.state.student_params)), np.asarray(leaf(restored)))
    np.testing.assert_array_equal(
        np.asarray(leaf(t2.state.ema_student_params)),
        np.asarray(leaf(restored)))
    assert not np.array_equal(np.asarray(leaf(t2.state.student_params)),
                              np.asarray(leaf(teacher2)))


def test_regression_distillation_trainer(flat_dir, tmp_path):
    """Regression mode: the student trains and is VALIDATED on its own
    custom grid (1-step [739]), and the saved checkpoint records the grid
    (student_timesteps.json) so inference/serving pick it up."""
    import json

    import jax
    from cv_diffusion_tpu.models import init_model
    from cv_diffusion_tpu.training import DistillationTrainer

    cfg = TrainConfig(
        unet_variant="tiny", image_size=32, epochs=1, batch_size=4,
        num_inference_steps=2, warmup_epochs=0, save_interval=100,
        sample_interval=100, output_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"))
    train_loader, _ = create_dataloaders(str(flat_dir), None, batch_size=4,
                                         image_size=32, use_synthetic=True)
    model, schedule = create_model(diffusion_config("tiny", image_size=32))
    teacher = init_model(model, jax.random.key(0))["params"]
    trainer = DistillationTrainer(
        model, schedule, teacher, train_loader, config=cfg, mesh=False,
        regression=True, student_timesteps=(739,), teacher_steps=2,
        gt_weight=0.25)
    assert trainer.student_timesteps == (739,)
    trainer.train()

    final = tmp_path / "ckpt" / "student_final"
    assert final.exists()
    marker = final / "student_timesteps.json"
    assert marker.exists()
    with open(marker) as f:
        assert json.load(f)["timesteps"] == [739]
