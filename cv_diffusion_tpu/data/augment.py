"""Paired image augmentation — NumPy/cv2 host pipeline.

Reproduces the reference's albumentations pipeline
(``src/training/dataset.py:184-218``) without the dependency: the *same*
geometric transform is applied to both images of a pair (albumentations'
``additional_targets={"high": "image"}``), then both are normalized to
[-1, 1] (mean .5 / std .5).

Train: RandomCrop(size) p=1 → HFlip p=.5 → VFlip p=.3 → Rotate(±15°) p=.3.
Eval:  CenterCrop(size).

Rotation uses cv2.warpAffine with reflect-101 borders and bilinear sampling —
albumentations' defaults.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

try:
    import cv2
    HAS_CV2 = True
except ImportError:  # pragma: no cover - cv2 is baked into the image
    HAS_CV2 = False


def random_crop_coords(rng: np.random.Generator, h: int, w: int,
                       size: int) -> Tuple[int, int]:
    if h < size or w < size:
        raise ValueError(f"image {h}x{w} smaller than crop {size}")
    top = int(rng.integers(0, h - size + 1))
    left = int(rng.integers(0, w - size + 1))
    return top, left


def center_crop_coords(h: int, w: int, size: int) -> Tuple[int, int]:
    # Same clear error as the random-crop path (and albumentations'
    # CenterCrop): a negative top/left would silently Python-slice a
    # few-row nonsense "image" and crash deep inside the model instead.
    if h < size or w < size:
        raise ValueError(f"image {h}x{w} smaller than crop {size}")
    return (h - size) // 2, (w - size) // 2


def crop(img: np.ndarray, top: int, left: int, size: int) -> np.ndarray:
    return img[top:top + size, left:left + size]


def rotate(img: np.ndarray, angle: float) -> np.ndarray:
    """Rotate about the center, reflect-101 border, bilinear."""
    if not HAS_CV2:
        raise RuntimeError("cv2 required for rotation augmentation")
    h, w = img.shape[:2]
    m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle, 1.0)
    return cv2.warpAffine(img, m, (w, h), flags=cv2.INTER_LINEAR,
                          borderMode=cv2.BORDER_REFLECT_101)


def normalize(img_u8: np.ndarray) -> np.ndarray:
    """uint8 [0,255] → float32 [-1, 1] (Normalize(mean=.5, std=.5))."""
    return (img_u8.astype(np.float32) / 255.0 - 0.5) / 0.5


def paired_train_transform(rng: np.random.Generator, low: np.ndarray,
                           high: np.ndarray, size: int,
                           hflip_p: float = 0.5, vflip_p: float = 0.3,
                           rotate_p: float = 0.3,
                           rotate_limit: float = 15.0
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """Identical geometric transform applied to both images, then normalize."""
    h, w = low.shape[:2]
    if high.shape[:2] != (h, w):
        # pairs can differ by a pixel in some datasets; crop to common area
        h = min(h, high.shape[0])
        w = min(w, high.shape[1])
        low, high = low[:h, :w], high[:h, :w]

    top, left = random_crop_coords(rng, h, w, size)
    low = crop(low, top, left, size)
    high = crop(high, top, left, size)

    if rng.random() < hflip_p:
        low, high = low[:, ::-1], high[:, ::-1]
    if rng.random() < vflip_p:
        low, high = low[::-1], high[::-1]
    if rng.random() < rotate_p:
        angle = float(rng.uniform(-rotate_limit, rotate_limit))
        low = rotate(np.ascontiguousarray(low), angle)
        high = rotate(np.ascontiguousarray(high), angle)

    return normalize(low), normalize(high)


def paired_eval_transform(low: np.ndarray, high: np.ndarray, size: int
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """CenterCrop + normalize (``dataset.py:202-213``)."""
    h = min(low.shape[0], high.shape[0])
    w = min(low.shape[1], high.shape[1])
    low, high = low[:h, :w], high[:h, :w]
    top, left = center_crop_coords(h, w, size)
    return (normalize(crop(low, top, left, size)),
            normalize(crop(high, top, left, size)))


def synthetic_low_light(rng: np.random.Generator, image_u8: np.ndarray,
                        gamma_range: Tuple[float, float] = (2.0, 5.0),
                        noise_level_range: Tuple[float, float] = (0.01, 0.05),
                        color_shift_p: float = 0.5) -> np.ndarray:
    """Synthetic degradation (``src/training/dataset.py:286-308``):
    random gamma darkening, gaussian noise, 50% per-channel color scale."""
    img = image_u8.astype(np.float32) / 255.0
    gamma = rng.uniform(*gamma_range)
    dark = np.power(img, gamma)
    noise_level = rng.uniform(*noise_level_range)
    noisy = np.clip(dark + rng.normal(0, noise_level, dark.shape), 0, 1)
    if rng.random() < color_shift_p:
        scale = rng.uniform(0.8, 1.0, size=3)
        noisy = np.clip(noisy * scale, 0, 1)
    return (noisy * 255).astype(np.uint8)
