"""Image-quality metrics: PSNR and SSIM, jit-compatible.

The reference lists torchmetrics/lpips in requirements but never computes any
quality metric (SURVEY §5); these are built new for the LOL-15 parity gate.
Inputs are expected in [0, 1] (use ``denormalize_image`` first).
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
    c = pred.shape[-1]
    kern = _gaussian_kernel(kernel_size, sigma)
    # depthwise conv: HWIO with feature_group_count = C
    kern = jnp.tile(kern[:, :, None, None], (1, 1, 1, c))

    def filt(x):
        # HIGHEST precision: TPU convs default to bf16 multiplies, which
        # breaks the E[x²]−µ² variance identity below (variances go ~1e-2
        # negative and SSIM explodes outside [-1, 1]).
        return jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c, precision=jax.lax.Precision.HIGHEST)

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2

    mu_p = filt(pred)
    mu_t = filt(target)
    mu_p2 = mu_p * mu_p
    mu_t2 = mu_t * mu_t
    mu_pt = mu_p * mu_t
    # true variances are ≥ 0; clamp residual rounding error so the
    # denominator stays positive
    sigma_p2 = jnp.maximum(filt(pred * pred) - mu_p2, 0.0)
    sigma_t2 = jnp.maximum(filt(target * target) - mu_t2, 0.0)
    sigma_pt = filt(pred * target) - mu_pt

    num = (2 * mu_pt + c1) * (2 * sigma_pt + c2)
    den = (mu_p2 + mu_t2 + c1) * (sigma_p2 + sigma_t2 + c2)
    return jnp.mean(num / den)


def mae(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) -
                            target.astype(jnp.float32)))
