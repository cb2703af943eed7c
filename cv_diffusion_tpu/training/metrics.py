"""Image-quality metrics: PSNR, SSIM, MS-SSIM, GMSD — jit-compatible.

The reference lists torchmetrics/lpips in requirements but never computes any
quality metric (SURVEY §5); these are built new for the LOL-15 parity gate.
Inputs are expected in [0, 1] (use ``denormalize_image`` first).

LPIPS needs pretrained VGG/AlexNet weights (unavailable offline), so the
perceptual axis beyond single-scale SSIM is covered by two strong
weights-free metrics instead: multi-scale SSIM (Wang et al. 2003) and GMSD
(gradient-magnitude similarity deviation, Xue et al. 2013 — one of the
highest-correlation classical perceptual metrics on TID/LIVE; LOWER is
better).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(pred: jnp.ndarray, target: jnp.ndarray,
         max_val: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB, averaged over the batch.

    pred/target: [B, H, W, C] in [0, max_val].
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mse = jnp.mean((pred - target) ** 2, axis=(1, 2, 3))
    mse = jnp.maximum(mse, 1e-12)
    return jnp.mean(10.0 * jnp.log10(max_val ** 2 / mse))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(coords ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM (Wang et al. 2004): 11×11 gaussian window, σ=1.5,
    C1=(0.01·L)², C2=(0.03·L)², valid-padding, channel-averaged.

    pred/target: [B, H, W, C] in [0, max_val].
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    # lum·cs factorization shared with ms_ssim; HIGHEST-precision convs
    # (TPU bf16 multiplies break the E[x²]−µ² variance identity) and the
    # ≥0 variance clamps live in _ssim_cs.
    return _ssim_cs(pred, target, max_val, kernel_size, sigma)[0]


def mae(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) -
                            target.astype(jnp.float32)))


def _ssim_cs(pred: jnp.ndarray, target: jnp.ndarray, max_val: float,
             kernel_size: int, sigma: float):
    """(mean SSIM, mean contrast-structure) — the per-scale pieces MS-SSIM
    composes.  Same windowing/precision rules as :func:`ssim`."""
    c = pred.shape[-1]
    kern = _gaussian_kernel(kernel_size, sigma)
    kern = jnp.tile(kern[:, :, None, None], (1, 1, 1, c))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c, precision=jax.lax.Precision.HIGHEST)

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_p, mu_t = filt(pred), filt(target)
    mu_p2, mu_t2, mu_pt = mu_p * mu_p, mu_t * mu_t, mu_p * mu_t
    sigma_p2 = jnp.maximum(filt(pred * pred) - mu_p2, 0.0)
    sigma_t2 = jnp.maximum(filt(target * target) - mu_t2, 0.0)
    sigma_pt = filt(pred * target) - mu_pt
    cs = (2 * sigma_pt + c2) / (sigma_p2 + sigma_t2 + c2)
    lum = (2 * mu_pt + c1) / (mu_p2 + mu_t2 + c1)
    return jnp.mean(lum * cs), jnp.mean(cs)


# Wang et al. 2003 scale weights (5 scales).
_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def ms_ssim(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0,
            kernel_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Multi-scale SSIM (Wang et al. 2003): contrast-structure at 5 dyadic
    scales (2× average-pool between them), luminance term at the coarsest,
    combined with the standard weights.  pred/target: [B, H, W, C] in
    [0, max_val]; needs H, W ≥ 11·2⁴ = 176 for the full 5 scales.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)

    def pool2(x):
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0

    vals = []
    for i, w in enumerate(_MSSSIM_WEIGHTS):
        ssim_mean, cs_mean = _ssim_cs(pred, target, max_val,
                                      kernel_size, sigma)
        last = i == len(_MSSSIM_WEIGHTS) - 1
        term = ssim_mean if last else cs_mean
        vals.append(jnp.maximum(term, 1e-6) ** w)
        if not last:
            pred, target = pool2(pred), pool2(target)
    return jnp.prod(jnp.stack(vals))


def gmsd(pred: jnp.ndarray, target: jnp.ndarray,
         max_val: float = 1.0) -> jnp.ndarray:
    """Gradient-magnitude similarity deviation (Xue et al. 2013); LOWER is
    better (0 = identical edge structure).  Luminance → 2× average pool →
    Prewitt gradient magnitudes → similarity map → std over the map.

    pred/target: [B, H, W, C] in [0, max_val].
    """
    def lum(x):
        x = x.astype(jnp.float32) / max_val
        if x.shape[-1] == 3:
            r, g, b = x[..., 0], x[..., 1], x[..., 2]
            return (0.299 * r + 0.587 * g + 0.114 * b)[..., None]
        return jnp.mean(x, axis=-1, keepdims=True)

    def pool2(x):
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0

    p, t = pool2(lum(pred)), pool2(lum(target))
    prewitt_x = jnp.asarray([[1, 0, -1], [1, 0, -1], [1, 0, -1]],
                            jnp.float32) / 3.0
    prewitt_y = prewitt_x.T
    kern = jnp.stack([prewitt_x, prewitt_y], axis=-1)[:, :, None, :]  # HWIO

    def grad_mag(x):
        g = jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)
        return jnp.sqrt(g[..., 0] ** 2 + g[..., 1] ** 2 + 1e-12)

    gm_p, gm_t = grad_mag(p), grad_mag(t)
    c = 0.0026  # T=170 on the [0,255]² scale (paper) → /255²
    gms = (2 * gm_p * gm_t + c) / (gm_p ** 2 + gm_t ** 2 + c)
    # per-image std, batch-averaged
    mean = jnp.mean(gms, axis=(1, 2), keepdims=True)
    return jnp.mean(jnp.sqrt(jnp.mean((gms - mean) ** 2, axis=(1, 2))))
