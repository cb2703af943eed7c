"""Data layer tests using tempdir fixtures of random PNGs."""

import numpy as np
import pytest
from PIL import Image

from cv_diffusion_tpu.data import (LowLightDataset, SyntheticLowLightDataset,
                                   DataLoader, create_dataloaders, augment)


@pytest.fixture()
def lol_dir(tmp_path):
    """LOL-style root/{low,high}/ with paired random images."""
    rng = np.random.default_rng(0)
    for sub in ("low", "high"):
        (tmp_path / sub).mkdir()
        for i in range(6):
            arr = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
            Image.fromarray(arr).save(tmp_path / sub / f"img_{i}.png")
    return tmp_path


@pytest.fixture()
def flat_dir(tmp_path):
    rng = np.random.default_rng(1)
    for i in range(4):
        arr = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"n_{i}.png")
    return tmp_path


def test_paired_dataset_basic(lol_dir):
    ds = LowLightDataset(str(lol_dir), image_size=64)
    assert len(ds) == 6
    item = ds[0]
    assert item["low_light"].shape == (64, 64, 3)
    assert item["normal_light"].shape == (64, 64, 3)
    assert item["low_light"].dtype == np.float32
    assert item["low_light"].min() >= -1.0 and item["low_light"].max() <= 1.0
    assert item["filename"] == "img_0.png"


def test_eval_transform_is_deterministic(lol_dir):
    ds = LowLightDataset(str(lol_dir), image_size=64, augment_data=False)
    a = ds[1]["low_light"]
    b = ds[1]["low_light"]
    np.testing.assert_array_equal(a, b)


def test_paired_augmentation_applies_same_geometry(lol_dir):
    # Feed identical low/high images: any paired geometric transform must
    # keep them identical (albumentations additional_targets parity,
    # ``src/training/dataset.py:215-218``).
    import shutil
    for f in (lol_dir / "low").iterdir():
        shutil.copy(f, lol_dir / "high" / f.name)
    ds = LowLightDataset(str(lol_dir), image_size=64, seed=3)
    for i in range(6):
        item = ds[i]
        np.testing.assert_allclose(item["low_light"], item["normal_light"],
                                   atol=1e-6)


def test_dirname_probing(tmp_path):
    rng = np.random.default_rng(0)
    for sub in ("dark", "bright"):
        (tmp_path / sub).mkdir()
        arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / sub / "a.png")
    ds = LowLightDataset(str(tmp_path), image_size=32)
    assert len(ds) == 1


def test_missing_root_raises():
    with pytest.raises(FileNotFoundError):
        LowLightDataset("/nonexistent/path")


def test_missing_subdir_error_lists_structure(tmp_path):
    (tmp_path / "something_else").mkdir()
    with pytest.raises(FileNotFoundError) as e:
        LowLightDataset(str(tmp_path))
    assert "something_else" in str(e.value)


def test_count_mismatch_truncates(lol_dir):
    extra = np.zeros((64, 64, 3), dtype=np.uint8)
    Image.fromarray(extra).save(lol_dir / "low" / "zzz_extra.png")
    ds = LowLightDataset(str(lol_dir), image_size=64)
    assert len(ds) == 6


def test_unpaired_mode(lol_dir):
    ds = LowLightDataset(str(lol_dir), image_size=64, paired=False)
    item = ds[0]
    assert item["low_light"].shape == (64, 64, 3)


def test_synthetic_dataset(flat_dir):
    ds = SyntheticLowLightDataset(str(flat_dir), image_size=64)
    assert len(ds) == 4
    item = ds[0]
    assert item["low_light"].shape == (64, 64, 3)
    # degraded input should be darker on average than target
    assert item["low_light"].mean() < item["normal_light"].mean()


def test_dataloader_batching(lol_dir):
    ds = LowLightDataset(str(lol_dir), image_size=64)
    dl = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True)
    batches = list(dl)
    assert len(batches) == 1  # 6 // 4 with drop_last
    assert batches[0]["low_light"].shape == (4, 64, 64, 3)
    dl2 = DataLoader(ds, batch_size=4, drop_last=False)
    batches = list(dl2)
    assert len(batches) == 2
    assert batches[1]["low_light"].shape == (2, 64, 64, 3)


def test_create_dataloaders(lol_dir):
    train, val = create_dataloaders(str(lol_dir), str(lol_dir), batch_size=2,
                                    image_size=64)
    assert len(train) == 3
    b = next(iter(train))
    assert b["low_light"].shape == (2, 64, 64, 3)
    assert val is not None


def test_create_dataloaders_auto_selects_native(lol_dir):
    from cv_diffusion_tpu.data.native import (NativeDataLoader,
                                              native_available)
    from cv_diffusion_tpu.data.prefetch import PrefetchLoader

    train, val = create_dataloaders(str(lol_dir), str(lol_dir), batch_size=2,
                                    image_size=64)
    assert isinstance(train, PrefetchLoader)
    if native_available():
        assert isinstance(train.loader, NativeDataLoader)
        assert isinstance(val.loader, NativeDataLoader)
    # Both backends honor the same iteration contract.
    for loader in (train, val):
        b = next(iter(loader))
        assert b["low_light"].shape == (2, 64, 64, 3)
        assert b["low_light"].dtype == np.float32


def test_create_dataloaders_native_val_matches_python(lol_dir):
    from cv_diffusion_tpu.data.native import native_available

    if not native_available():
        pytest.skip("native library not built")
    _, val_native = create_dataloaders(str(lol_dir), str(lol_dir),
                                       batch_size=3, image_size=64,
                                       native=True, prefetch=0)
    _, val_py = create_dataloaders(str(lol_dir), str(lol_dir), batch_size=3,
                                   image_size=64, native=False, prefetch=0)
    for bn, bp in zip(val_native, val_py):
        np.testing.assert_allclose(bn["low_light"], bp["low_light"],
                                   atol=1e-5)
        np.testing.assert_allclose(bn["normal_light"], bp["normal_light"],
                                   atol=1e-5)


def test_create_dataloaders_native_synthetic(flat_dir):
    from cv_diffusion_tpu.data.native import (NativeSyntheticDataLoader,
                                              native_available)

    if not native_available():
        pytest.skip("native library not built")
    train, _ = create_dataloaders(str(flat_dir), batch_size=2, image_size=64,
                                  use_synthetic=True, native=True, prefetch=0)
    assert isinstance(train, NativeSyntheticDataLoader)
    b = next(iter(train))
    assert b["low_light"].shape == (2, 64, 64, 3)
    # degraded input is darker than the target
    assert b["low_light"].mean() < b["normal_light"].mean()


def test_prefetch_loader_equivalence(lol_dir):
    from cv_diffusion_tpu.data.prefetch import PrefetchLoader

    ds = LowLightDataset(str(lol_dir), image_size=64, augment_data=False)
    base = DataLoader(ds, batch_size=2)
    pre = PrefetchLoader(DataLoader(ds, batch_size=2), prefetch=2)
    assert len(pre) == len(base)
    for _ in range(2):  # re-iterable across epochs
        for bb, bp in zip(base, pre):
            np.testing.assert_array_equal(bb["low_light"], bp["low_light"])


def test_prefetch_loader_early_stop_does_not_drain_epoch():
    """Breaking out of a PrefetchLoader (sample grids, max_batches eval)
    must stop the producer after at most prefetch+2 batches — not decode
    the whole remaining epoch into the void."""
    import time
    from cv_diffusion_tpu.data.prefetch import PrefetchLoader

    produced = []

    class Counting:
        def __len__(self):
            return 1000

        def __iter__(self):
            for i in range(1000):
                produced.append(i)
                yield {"low_light": np.full(1, i)}

    pre = PrefetchLoader(Counting(), prefetch=2)
    first = next(iter(pre))
    np.testing.assert_array_equal(first["low_light"], np.zeros(1))
    # Give the (now-signalled) producer a moment to wind down.
    deadline = time.time() + 5.0
    while time.time() < deadline and len(produced) > 990:
        time.sleep(0.01)
    assert len(produced) <= 6, f"producer ran on: {len(produced)} batches"


def test_prefetch_loader_propagates_errors():
    from cv_diffusion_tpu.data.prefetch import PrefetchLoader

    class Boom:
        def __len__(self):
            return 1

        def __iter__(self):
            yield {"low_light": np.zeros(1)}
            raise ValueError("decode failed")

    pre = PrefetchLoader(Boom(), prefetch=2)
    with pytest.raises(ValueError, match="decode failed"):
        list(pre)


def test_synthetic_degradation_properties():
    rng = np.random.default_rng(0)
    img = rng.integers(100, 255, (64, 64, 3), dtype=np.uint8)
    low = augment.synthetic_low_light(rng, img)
    assert low.dtype == np.uint8
    assert low.mean() < img.mean()


def test_normalize_range():
    img = np.array([[[0, 128, 255]]], dtype=np.uint8)
    out = augment.normalize(img)
    assert out[0, 0, 0] == pytest.approx(-1.0)
    assert out[0, 0, 2] == pytest.approx(1.0)
    assert abs(out[0, 0, 1]) < 0.01


def test_rotation_shape_preserved():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (50, 70, 3), dtype=np.uint8)
    out = augment.rotate(img, 13.0)
    assert out.shape == img.shape


def test_dirname_probing_high_only(tmp_path):
    """root/{low,normal}/: the low dir needs no probing but the high dir
    does — each side must probe independently."""
    rng = np.random.default_rng(0)
    for sub in ("low", "normal"):
        (tmp_path / sub).mkdir()
        arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / sub / "a.png")
    ds = LowLightDataset(str(tmp_path), image_size=32)
    assert len(ds) == 1


def test_create_dataloaders_routes_kwargs_per_dataset(flat_dir, lol_dir):
    """Synthetic-train kwargs (gamma_range) and paired-val construction use
    disjoint constructor signatures; each kwarg reaches only the class that
    accepts it, and typos are rejected."""
    train, val = create_dataloaders(
        str(flat_dir), str(lol_dir), batch_size=2, image_size=32,
        use_synthetic=True, gamma_range=(2.0, 3.0), native=False, prefetch=0)
    assert len(train) >= 1 and len(val) >= 1
    with pytest.raises(TypeError, match="unknown dataset kwargs"):
        create_dataloaders(str(flat_dir), None, batch_size=2, image_size=32,
                           use_synthetic=True, gama_range=(2.0, 3.0),
                           native=False, prefetch=0)


def test_create_dataloaders_unpaired_falls_back_to_python(lol_dir):
    """The native pipeline always pairs by index; paired=False must select
    the Python loader (random high-image pairing), not crash or silently
    change semantics."""
    from cv_diffusion_tpu.data.dataset import DataLoader as PyLoader

    train, _ = create_dataloaders(str(lol_dir), None, batch_size=2,
                                  image_size=32, paired=False, prefetch=0)
    assert isinstance(train, PyLoader)


def test_create_dataloaders_bmp_falls_back_to_python(tmp_path):
    """PIL decodes .bmp but the native decoder is PNG/JPEG-only: a dataset
    containing .bmp files must auto-select the Python loader instead of
    failing at the first native batch."""
    from cv_diffusion_tpu.data.dataset import DataLoader as PyLoader
    from cv_diffusion_tpu.data.native import native_available

    rng = np.random.default_rng(0)
    for sub in ("low", "high"):
        (tmp_path / sub).mkdir()
        for i in range(2):
            arr = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
            Image.fromarray(arr).save(tmp_path / sub / f"b_{i}.bmp")
    train, _ = create_dataloaders(str(tmp_path), None, batch_size=2,
                                  image_size=32, prefetch=0)
    assert isinstance(train, PyLoader)
    batch = next(iter(train))
    assert batch["low_light"].shape == (2, 32, 32, 3)
    if native_available():
        with pytest.raises(RuntimeError, match="non-PNG/JPEG"):
            create_dataloaders(str(tmp_path), None, batch_size=2,
                               image_size=32, native=True, prefetch=0)


def test_prefetch_loader_early_close_swallows_pending_producer_error():
    """After an intentional early break, errors the producer hit on batches
    the consumer never requested must NOT surface at generator close time;
    full consumption must still raise."""
    import time
    from cv_diffusion_tpu.data.prefetch import PrefetchLoader

    class Boomy:
        def __len__(self):
            return 5

        def __iter__(self):
            yield {"a": np.zeros(1)}
            yield {"a": np.ones(1)}
            raise IOError("corrupt batch 3")

    pre = PrefetchLoader(Boomy(), prefetch=4)
    it = iter(pre)
    next(it)
    time.sleep(0.3)  # let the producer reach the error
    it.close()  # must not raise


def test_shard_files_by_process():
    """Multi-host data sharding: disjoint equal-length strided shards, and
    the same stride on low/high lists keeps pairs aligned."""
    from cv_diffusion_tpu.data.dataset import shard_files_by_process

    files = list(range(10))
    shards = [shard_files_by_process(files, p, 3) for p in range(3)]
    assert all(len(s) == 3 for s in shards)  # equal steps per process
    combined = [x for s in shards for x in s]
    assert len(set(combined)) == 9  # disjoint (one file dropped by trunc)

    low = [f"l{i}" for i in range(10)]
    high = [f"h{i}" for i in range(10)]
    l1 = shard_files_by_process(low, 1, 3)
    h1 = shard_files_by_process(high, 1, 3)
    assert [s[1:] for s in l1] == [s[1:] for s in h1]  # pairs aligned

    assert shard_files_by_process(files, 0, 1) == files  # single-process
    with pytest.raises(ValueError):
        shard_files_by_process([1], 0, 2)
    with pytest.raises(ValueError):
        shard_files_by_process(files, 3, 3)
