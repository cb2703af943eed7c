#!/usr/bin/env python
"""Generate a LOL-style paired low/normal-light dataset on disk.

The reference assumes the LOL dataset exists at ``src/data/our485`` /
``src/data/eval15`` (``scripts/train.py:38-44``, ``README.md:239-240``) but
ships no data and no way to fabricate any.  This CLI creates a
``root/{low,high}/`` tree the paired pipeline can train/evaluate on in
airgapped environments: procedurally generated natural-image-like scenes
(low-frequency Fourier backgrounds, random shapes, value-noise texture),
degraded with the reference's synthetic low-light model
(``src/training/dataset.py:286-308`` — gamma darkening, sensor noise, color
shift), deterministically per image so evaluation splits are reproducible.

Usage:
    python scripts/make_synthetic_dataset.py --out /data/synth_lol \
        --train 400 --val 15 --size 192
"""

import argparse
import sys
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cv_diffusion_tpu.data.augment import synthetic_low_light


def _fourier_background(rng: np.random.Generator, size: int) -> np.ndarray:
    """Smooth colored background from a few low-frequency components."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    img = np.zeros((size, size, 3), np.float32)
    for _ in range(rng.integers(2, 5)):
        fx, fy = rng.uniform(0.5, 3.0, 2)
        phase = rng.uniform(0, 2 * np.pi, 3)
        amp = rng.uniform(0.1, 0.4, 3)
        wave = np.sin(2 * np.pi * (fx * xx + fy * yy)[..., None]
                      + phase[None, None])
        img += amp[None, None] * wave
    return img


def _value_noise(rng: np.random.Generator, size: int, cells: int) -> np.ndarray:
    """Bilinear-upsampled random grid — cheap texture."""
    grid = rng.uniform(-1, 1, (cells, cells, 3)).astype(np.float32)
    img = np.asarray(Image.fromarray(
        ((grid + 1) * 127.5).astype(np.uint8)).resize(
            (size, size), Image.BILINEAR), np.float32) / 127.5 - 1.0
    return img


def _add_shapes(rng: np.random.Generator, img: np.ndarray) -> np.ndarray:
    size = img.shape[0]
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    for _ in range(rng.integers(3, 9)):
        cy, cx = rng.uniform(0, size, 2)
        ry, rx = rng.uniform(size * 0.05, size * 0.35, 2)
        theta = rng.uniform(0, np.pi)
        ct, st = np.cos(theta), np.sin(theta)
        dy, dx = yy - cy, xx - cx
        u = (ct * dx - st * dy) / rx
        v = (st * dx + ct * dy) / ry
        mask = (u * u + v * v) < 1.0
        color = rng.uniform(-0.9, 0.9, 3).astype(np.float32)
        alpha = rng.uniform(0.4, 1.0)
        img[mask] = (1 - alpha) * img[mask] + alpha * color[None]
    return img


def generate_scene(rng: np.random.Generator, size: int) -> np.ndarray:
    """One synthetic normal-light scene, uint8 RGB."""
    img = _fourier_background(rng, size)
    img += 0.3 * _value_noise(rng, size, int(rng.integers(4, 16)))
    img = _add_shapes(rng, img)
    # global exposure to a well-lit range
    img = np.tanh(img) * 0.5 + rng.uniform(0.45, 0.65)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def _photo_crops(rng: np.random.Generator, size: int, count: int):
    """Random crops of sklearn's two bundled photographs (china, flower) —
    the only real photos available offline; adds natural image statistics."""
    try:
        from sklearn.datasets import load_sample_images
    except ImportError:
        return
    images = load_sample_images().images
    for _ in range(count):
        im = images[int(rng.integers(len(images)))]
        h, w = im.shape[:2]
        if h < size or w < size:
            continue
        top = int(rng.integers(0, h - size + 1))
        left = int(rng.integers(0, w - size + 1))
        crop = np.asarray(im[top:top + size, left:left + size], np.uint8)
        # brighten dark crops into "normal light" range
        if crop.mean() < 90:
            crop = np.clip(crop.astype(np.float32) * (110 / max(crop.mean(), 1)),
                           0, 255).astype(np.uint8)
        yield crop


def write_split(root: Path, n: int, size: int, seed: int,
                photo_fraction: float = 0.25) -> None:
    low_dir = root / "low"
    high_dir = root / "high"
    low_dir.mkdir(parents=True, exist_ok=True)
    high_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_photo = int(n * photo_fraction)
    highs = list(_photo_crops(rng, size, n_photo))
    while len(highs) < n:
        highs.append(generate_scene(rng, size))
    rng.shuffle(highs)
    for i, high in enumerate(highs[:n]):
        # per-image deterministic degradation → reproducible pairs
        deg_rng = np.random.default_rng(seed * 1_000_003 + i)
        low = synthetic_low_light(deg_rng, high)
        Image.fromarray(high).save(high_dir / f"{i:05d}.png")
        Image.fromarray(low).save(low_dir / f"{i:05d}.png")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--train", type=int, default=400)
    p.add_argument("--val", type=int, default=15,
                   help="LOL eval15-sized held-out split")
    p.add_argument("--size", type=int, default=192)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    out = Path(args.out)
    write_split(out / "train", args.train, args.size, args.seed)
    # Val is procedural-only: the two bundled sklearn photos also feed the
    # train split, so photo crops in val would leak training content and
    # overstate generalization.
    write_split(out / "val", args.val, args.size, args.seed + 77,
                photo_fraction=0.0)
    print(f"Wrote {args.train} train + {args.val} val pairs "
          f"({args.size}x{args.size}) under {out}")


if __name__ == "__main__":
    main()
