"""Native C++ data pipeline tests (decode parity, augmentation semantics).

Skipped when the shared library hasn't been built (``make -C native``); CI
and the driver build it via the Makefile.
"""

import numpy as np
import pytest
from PIL import Image

from cv_diffusion_tpu.data import augment as py_augment
from cv_diffusion_tpu.data import native

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native lib not built")


@pytest.fixture()
def lol_dir(tmp_path):
    rng = np.random.default_rng(0)
    for sub in ("low", "high"):
        (tmp_path / sub).mkdir()
        for i in range(6):
            arr = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
            Image.fromarray(arr).save(tmp_path / sub / f"img_{i}.png")
    return tmp_path


def test_decode_parity_png(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (50, 70, 3), dtype=np.uint8)
    p = tmp_path / "x.png"
    Image.fromarray(arr).save(p)
    out = native.decode_image(str(p))
    np.testing.assert_array_equal(out, arr)


def test_decode_parity_jpeg(tmp_path):
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 255, (50, 70, 3), dtype=np.uint8)
    p = tmp_path / "x.jpg"
    Image.fromarray(arr).save(p, quality=95)
    out = native.decode_image(str(p))
    ref = np.array(Image.open(p).convert("RGB"))
    # JPEG decode is decoder-dependent to ±1-2 LSB
    assert out.shape == ref.shape
    assert np.abs(out.astype(int) - ref.astype(int)).mean() < 2.0


def test_pair_batch_eval_matches_python(lol_dir):
    """Eval path (center crop + normalize) must equal the Python pipeline."""
    low_paths = sorted(str(p) for p in (lol_dir / "low").iterdir())
    high_paths = sorted(str(p) for p in (lol_dir / "high").iterdir())
    low, high, failed = native.load_pair_batch(low_paths, high_paths, 64,
                                               seed=0, augment=False)
    assert not failed.any()
    for i, (lp, hp) in enumerate(zip(low_paths, high_paths)):
        pl_ = np.array(Image.open(lp))
        ph = np.array(Image.open(hp))
        ref_low, ref_high = py_augment.paired_eval_transform(pl_, ph, 64)
        np.testing.assert_allclose(low[i], ref_low, atol=1e-6)
        np.testing.assert_allclose(high[i], ref_high, atol=1e-6)


def test_pair_batch_augment_applies_same_geometry(lol_dir):
    """Identical low/high inputs must stay identical under paired augment."""
    low_paths = sorted(str(p) for p in (lol_dir / "low").iterdir())
    low, high, failed = native.load_pair_batch(low_paths, low_paths, 64,
                                               seed=7, augment=True)
    assert not failed.any()
    np.testing.assert_allclose(low, high, atol=1e-6)
    assert low.min() >= -1.0 and low.max() <= 1.0


def test_pair_batch_deterministic_by_seed(lol_dir):
    low_paths = sorted(str(p) for p in (lol_dir / "low").iterdir())
    high_paths = sorted(str(p) for p in (lol_dir / "high").iterdir())
    a = native.load_pair_batch(low_paths, high_paths, 64, seed=3, augment=True)
    b = native.load_pair_batch(low_paths, high_paths, 64, seed=3, augment=True)
    np.testing.assert_array_equal(a[0], b[0])
    c = native.load_pair_batch(low_paths, high_paths, 64, seed=4, augment=True)
    assert np.abs(a[0] - c[0]).max() > 0


def test_synth_batch(lol_dir):
    paths = sorted(str(p) for p in (lol_dir / "high").iterdir())
    low, high, failed = native.load_synth_batch(paths, 64, seed=0)
    assert not failed.any()
    # degraded input darker than target on average (gamma ≥ 2)
    assert low.mean() < high.mean()
    assert low.min() >= -1.0 and low.max() <= 1.0


def test_missing_file_flagged(lol_dir):
    low_paths = sorted(str(p) for p in (lol_dir / "low").iterdir())
    bad = low_paths[:2] + ["/nonexistent/file.png"]
    high = low_paths[:3]
    _, _, failed = native.load_pair_batch(bad, high, 64, seed=0,
                                          augment=False)
    assert failed.tolist() == [0, 0, 1]


def test_native_dataloader_iteration(lol_dir):
    dl = native.NativeDataLoader.from_dataset_dir(
        str(lol_dir), image_size=64, batch_size=4, shuffle=True,
        drop_last=True, seed=0)
    batches = list(dl)
    assert len(batches) == 1
    assert batches[0]["low_light"].shape == (4, 64, 64, 3)
    assert batches[0]["low_light"].dtype == np.float32
    # epochs reshuffle and re-seed augmentation
    b2 = list(dl)[0]
    assert np.abs(batches[0]["low_light"] - b2["low_light"]).max() > 0


def test_rotate_parity_with_cv2():
    """The native rotation (inverse-map bilinear, reflect-101, center
    (w/2-0.5, h/2-0.5)) must match augment.rotate's cv2.warpAffine within
    1 LSB — the only geometric transform whose convention could silently
    diverge between the two pipelines (crops/flips are exact index ops)."""
    if not py_augment.HAS_CV2:
        pytest.skip("cv2 not available")
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    for angle in (-15.0, -7.3, 0.0, 4.9, 15.0):
        ref = py_augment.rotate(img, angle)
        got = native.rotate_u8(img, angle)
        diff = np.abs(ref.astype(np.int16) - got.astype(np.int16))
        # interior must agree to 1 LSB; borders may differ slightly where
        # cv2's fixed-point (5-bit) interpolation rounds reflect-101 taps
        assert diff[2:-2, 2:-2].max() <= 1, f"angle={angle}"
        assert float(diff.mean()) < 0.5, f"angle={angle}"
