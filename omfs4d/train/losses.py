"""Image losses for 3DGS avatar training: L1 + D-SSIM (the 0.8/0.2 mix the
GaussianAvatars trainer uses), plus PSNR."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(pred: jnp.ndarray, target: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Windowed SSIM over (H, W, C) images in [0, 1]."""
    w = _gaussian_window(window_size)[:, :, None, None]        # (k, k, 1, 1)
    c = pred.shape[-1]
    kernel = jnp.tile(w, (1, 1, 1, c))                          # depthwise

    def filt(img):
        img4 = img[None]                                        # (1, H, W, C)
        return jax.lax.conv_general_dilated(
            img4, kernel,
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )[0]

    mu_x = filt(pred)
    mu_y = filt(target)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sig_x = filt(pred * pred) - mu_x2
    sig_y = filt(target * target) - mu_y2
    sig_xy = filt(pred * target) - mu_xy

    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    s = ((2 * mu_xy + c1) * (2 * sig_xy + c2)) / (
        (mu_x2 + mu_y2 + c1) * (sig_x + sig_y + c2)
    )
    return jnp.mean(s)


def dssim_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return (1.0 - ssim(pred, target)) / 2.0


def psnr(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))
