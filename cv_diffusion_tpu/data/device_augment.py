"""On-device (jit'd) paired augmentation.

TPU-side counterpart of the host pipelines (``data/augment.py`` Python,
``native/dataloader.cc`` C++): the host ships full decoded frames once and
the random crop / flips / rotation run inside the training step's XLA
program — per SURVEY §7.4's build plan.  Useful when host CPU is the
bottleneck (one decode, many augmented epochs) or frames are cached on
device.

Semantics mirror the host pipeline (and the reference's albumentations
chain, ``src/training/dataset.py:190-213``): one geometric transform applied
to both images of a pair — RandomCrop p=1, HFlip p=.5, VFlip p=.3,
Rotate(±15°) p=.3 (bilinear, reflect-101) — then values are assumed already
normalized to [-1, 1].

All shapes are static: full frames [B, H, W, C] in, crops [B, S, S, C] out.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _reflect101(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """OpenCV BORDER_REFLECT_101 index folding."""
    period = 2 * n - 2 if n > 1 else 1
    idx = jnp.abs(idx) % period
    return jnp.where(idx >= n, period - idx, idx)


def _rotate_bilinear(img: jnp.ndarray, angle_deg: jnp.ndarray) -> jnp.ndarray:
    """Rotate one [S, S, C] image about its center (cv2 convention:
    center (S/2−0.5, S/2−0.5)), bilinear, reflect-101 borders."""
    s = img.shape[0]
    a = angle_deg * (jnp.pi / 180.0)
    ca, sa = jnp.cos(a), jnp.sin(a)
    c = s / 2.0 - 0.5
    ys = jnp.arange(s, dtype=jnp.float32) - c
    xs = jnp.arange(s, dtype=jnp.float32) - c
    dy, dx = jnp.meshgrid(ys, xs, indexing="ij")
    # inverse map (dst → src)
    sx = ca * dx - sa * dy + c
    sy = sa * dx + ca * dy + c
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    x0r = _reflect101(x0, s)
    x1r = _reflect101(x0 + 1, s)
    y0r = _reflect101(y0, s)
    y1r = _reflect101(y0 + 1, s)
    v00 = img[y0r, x0r]
    v01 = img[y0r, x1r]
    v10 = img[y1r, x0r]
    v11 = img[y1r, x1r]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)


@functools.partial(jax.jit, static_argnames=("size", "hflip_p", "vflip_p",
                                             "rotate_p", "rotate_limit"))
def paired_augment(rng: jax.Array, low: jnp.ndarray, high: jnp.ndarray,
                   size: int, hflip_p: float = 0.5, vflip_p: float = 0.3,
                   rotate_p: float = 0.3, rotate_limit: float = 15.0
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched paired augmentation, one independent transform per pair.

    Args:
      rng: PRNG key.
      low / high: [B, H, W, C] float frames (already normalized).
      size: crop size S.
    Returns:
      (low_crops, high_crops): [B, S, S, C].
    """
    b, h, w, c = low.shape
    k_top, k_left, k_h, k_v, k_rp, k_ra = jax.random.split(rng, 6)
    tops = jax.random.randint(k_top, (b,), 0, h - size + 1)
    lefts = jax.random.randint(k_left, (b,), 0, w - size + 1)
    do_h = jax.random.uniform(k_h, (b,)) < hflip_p
    do_v = jax.random.uniform(k_v, (b,)) < vflip_p
    do_r = jax.random.uniform(k_rp, (b,)) < rotate_p
    angles = jax.random.uniform(k_ra, (b,), minval=-rotate_limit,
                                maxval=rotate_limit)

    def one(img, top, left, fh, fv, fr, ang):
        crop = jax.lax.dynamic_slice(img, (top, left, 0), (size, size, c))
        crop = jax.lax.cond(fh, lambda x: x[:, ::-1], lambda x: x, crop)
        crop = jax.lax.cond(fv, lambda x: x[::-1], lambda x: x, crop)
        crop = jax.lax.cond(fr, lambda x: _rotate_bilinear(x, ang),
                            lambda x: x, crop)
        return crop

    aug = jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, 0))
    return (aug(low, tops, lefts, do_h, do_v, do_r, angles),
            aug(high, tops, lefts, do_h, do_v, do_r, angles))


@functools.partial(jax.jit, static_argnames=("size",))
def paired_center_crop(low: jnp.ndarray, high: jnp.ndarray, size: int
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eval-path center crop (``dataset.py:202-207``)."""
    b, h, w, c = low.shape
    top = (h - size) // 2
    left = (w - size) // 2
    sl = lambda x: jax.lax.dynamic_slice(
        x, (0, top, left, 0), (b, size, size, c))
    return sl(low), sl(high)


@functools.partial(jax.jit, static_argnames=("gamma_range",
                                             "noise_level_range",
                                             "color_shift_p"))
def synthetic_low_light(rng: jax.Array, normal: jnp.ndarray,
                        gamma_range: Tuple[float, float] = (2.0, 5.0),
                        noise_level_range: Tuple[float, float] = (0.01, 0.05),
                        color_shift_p: float = 0.5) -> jnp.ndarray:
    """On-device synthetic degradation (``dataset.py:286-308``).

    Args:
      normal: [B, S, S, 3] in [-1, 1].
    Returns degraded low-light frames in [-1, 1].
    """
    b = normal.shape[0]
    k_g, k_nl, k_n, k_cp, k_cs = jax.random.split(rng, 5)
    img01 = (normal + 1.0) * 0.5
    gamma = jax.random.uniform(k_g, (b, 1, 1, 1), minval=gamma_range[0],
                               maxval=gamma_range[1])
    dark = jnp.power(jnp.maximum(img01, 0.0), gamma)
    noise_level = jax.random.uniform(
        k_nl, (b, 1, 1, 1), minval=noise_level_range[0],
        maxval=noise_level_range[1])
    noisy = jnp.clip(dark + jax.random.normal(k_n, dark.shape) * noise_level,
                     0.0, 1.0)
    scale = jax.random.uniform(k_cs, (b, 1, 1, 3), minval=0.8, maxval=1.0)
    do_shift = (jax.random.uniform(k_cp, (b, 1, 1, 1)) < color_shift_p)
    noisy = jnp.clip(jnp.where(do_shift, noisy * scale, noisy), 0.0, 1.0)
    # 8-bit quantization baked into the degraded input, matching the host
    # (augment.py: *255→uint8→normalize) and C++ pipelines — a model must
    # see the same input distribution regardless of which loader fed it.
    # floor, not round: the host astype(uint8) and the C++ static_cast both
    # TRUNCATE, and rounding here would shift device-fed inputs brighter by
    # ~0.5/255 on average.
    noisy = jnp.floor(noisy * 255.0) / 255.0
    # clip: XLA may fuse /255*2 into one inexact multiply (255→1.0000001)
    return jnp.clip(noisy * 2.0 - 1.0, -1.0, 1.0)
