"""Device-resident frame cache (data/device_cache.py): equivalence with the
host loaders, iteration semantics, and create_dataloaders wiring."""

from pathlib import Path

import jax
import numpy as np
import pytest
from PIL import Image

from cv_diffusion_tpu.data.dataset import (DataLoader, LowLightDataset,
                                           create_dataloaders)
from cv_diffusion_tpu.data.device_cache import DeviceCacheLoader, load_frames


@pytest.fixture(scope="module")
def paired_dir(tmp_path_factory):
    """8 deterministic 40x56 pairs under root/{low,high}/."""
    root = tmp_path_factory.mktemp("dcache")
    rng = np.random.default_rng(0)
    for sub in ("low", "high"):
        (root / sub).mkdir()
    for i in range(8):
        high = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
        low = (high * rng.uniform(0.1, 0.4)).astype(np.uint8)
        Image.fromarray(low).save(root / "low" / f"{i:02d}.png")
        Image.fromarray(high).save(root / "high" / f"{i:02d}.png")
    return root


def _paths(root: Path):
    ds = LowLightDataset(str(root), image_size=32, augment_data=False)
    return ([str(p) for p in ds.low_images], [str(p) for p in ds.high_images])


def test_load_frames_uniform_and_values(paired_dir):
    lows, _ = _paths(paired_dir)
    frames = load_frames(lows)
    assert frames.shape == (8, 40, 56, 3) and frames.dtype == np.uint8
    ref = np.array(Image.open(lows[0]).convert("RGB"))
    np.testing.assert_array_equal(frames[0], ref)


def test_load_frames_rejects_mixed_sizes(tmp_path):
    a, b = tmp_path / "a.png", tmp_path / "b.png"
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(a)
    Image.fromarray(np.zeros((48, 32, 3), np.uint8)).save(b)
    with pytest.raises(ValueError, match="uniform frame sizes"):
        load_frames([str(a), str(b)])


def test_center_crop_matches_host_loader(paired_dir):
    """augment=False device batches == the host eval pipeline exactly
    (same uint8 source, same center crop, same normalize arithmetic)."""
    lows, highs = _paths(paired_dir)
    dev = DeviceCacheLoader(lows, highs, image_size=32, batch_size=4,
                            shuffle=False, augment=False)
    host = DataLoader(LowLightDataset(str(paired_dir), image_size=32,
                                      augment_data=False),
                      batch_size=4, shuffle=False)
    for dbatch, hbatch in zip(dev, host):
        # u8/127.5-1 vs (u8/255-.5)/.5 differ by at most ~1 ulp
        np.testing.assert_allclose(np.asarray(dbatch["low_light"]),
                                   hbatch["low_light"], atol=1e-6)
        np.testing.assert_allclose(np.asarray(dbatch["normal_light"]),
                                   hbatch["normal_light"], atol=1e-6)
        assert dbatch["filenames"] == hbatch["filenames"]


def test_augment_pairing_and_determinism(paired_dir):
    lows, highs = _paths(paired_dir)

    def batches(seed):
        loader = DeviceCacheLoader(lows, highs, image_size=32, batch_size=4,
                                   shuffle=True, drop_last=True, augment=True,
                                   seed=seed)
        return [{k: np.asarray(v) for k, v in b.items() if k != "filenames"}
                for b in loader]

    a, b = batches(7), batches(7)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["low_light"], y["low_light"])
        np.testing.assert_array_equal(x["normal_light"], y["normal_light"])
    c = batches(8)
    assert any(np.abs(x["low_light"] - y["low_light"]).max() > 0
               for x, y in zip(a, c))
    # epochs differ (fresh shuffle + fresh augmentation keys)
    loader = DeviceCacheLoader(lows, highs, image_size=32, batch_size=4,
                               shuffle=True, drop_last=True, seed=7)
    e1 = [np.asarray(b["low_light"]) for b in loader]
    e2 = [np.asarray(b["low_light"]) for b in loader]
    assert any(np.abs(x - y).max() > 0 for x, y in zip(e1, e2))


def test_augmented_crops_are_source_windows(paired_dir):
    """The paired geometric transform preserves the low<->high alignment:
    identical low/high sources must stay identical after augmentation."""
    lows, _ = _paths(paired_dir)
    loader = DeviceCacheLoader(lows, lows, image_size=32, batch_size=4,
                               shuffle=False, augment=True, seed=3)
    batch = next(iter(loader))
    np.testing.assert_allclose(np.asarray(batch["low_light"]),
                               np.asarray(batch["normal_light"]), atol=1e-6)


def test_rejects_mismatched_pair_sizes(tmp_path, paired_dir):
    """Mismatched low/high frame H/W must fail loudly (and host-side,
    before any upload): paired crops reuse the low block's offsets."""
    lows, _ = _paths(paired_dir)  # 40x56 frames
    big = []
    for i in range(len(lows)):
        p = tmp_path / f"hi_{i:02d}.png"
        Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(p)
        big.append(str(p))
    with pytest.raises(ValueError, match="matching low/high frame sizes"):
        DeviceCacheLoader(lows, big, image_size=32, batch_size=4)


def test_synthetic_mode(paired_dir):
    _, highs = _paths(paired_dir)
    loader = DeviceCacheLoader(highs, None, image_size=32, batch_size=4,
                               shuffle=True, drop_last=True, seed=0)
    assert loader.synthetic and len(loader) == 2
    batch = next(iter(loader))
    low = np.asarray(batch["low_light"])
    high = np.asarray(batch["normal_light"])
    assert low.shape == high.shape == (4, 32, 32, 3)
    assert low.min() >= -1.0 and low.max() <= 1.0
    # gamma >= 2 darkening: degraded inputs are darker than their sources
    assert low.mean() < high.mean()
    # 8-bit quantization baked in, like the host/native synthetic paths
    vals = (low.astype(np.float32) + 1.0) / 2.0 * 255.0
    np.testing.assert_allclose(vals, np.round(vals), atol=5e-2)


def test_len_and_drop_last(paired_dir):
    lows, highs = _paths(paired_dir)
    assert len(DeviceCacheLoader(lows, highs, 32, batch_size=3,
                                 drop_last=True)) == 2
    assert len(DeviceCacheLoader(lows, highs, 32, batch_size=3,
                                 drop_last=False)) == 3
    ragged = [b["low_light"].shape[0] for b in
              DeviceCacheLoader(lows, highs, 32, batch_size=3,
                                drop_last=False, augment=False)]
    assert ragged == [3, 3, 2]


def test_create_dataloaders_device_cache(paired_dir):
    train, val = create_dataloaders(str(paired_dir), str(paired_dir),
                                    batch_size=4, image_size=32,
                                    device_cache=True)
    assert isinstance(train, DeviceCacheLoader)
    assert not isinstance(val, DeviceCacheLoader)  # val stays host-side
    batch = next(iter(train))
    assert batch["low_light"].shape == (4, 32, 32, 3)
    assert isinstance(batch["low_light"], jax.Array)


@pytest.mark.slow
def test_trainer_runs_with_device_cache(paired_dir):
    """One real Trainer epoch consuming device-resident batches."""
    from cv_diffusion_tpu.config import TrainConfig, diffusion_config
    from cv_diffusion_tpu.models.diffusion import create_model
    from cv_diffusion_tpu.training.trainer import Trainer

    cfg = TrainConfig(unet_variant="tiny", image_size=32, batch_size=4,
                      epochs=1, use_ema=False, data_on_device=True,
                      output_dir="/tmp/dcache_out",
                      checkpoint_dir="/tmp/dcache_ckpt",
                      save_interval=100, sample_interval=100)
    train, val = create_dataloaders(str(paired_dir), None, batch_size=4,
                                    image_size=32, device_cache=True)
    model, schedule = create_model(diffusion_config("tiny", image_size=32))
    trainer = Trainer(model, schedule, train, None, cfg, mesh=False)
    loss = trainer.train_epoch()
    assert np.isfinite(loss)
