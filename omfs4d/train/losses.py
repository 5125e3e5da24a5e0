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


def _band_matrix(n: int, size: int, sigma: float) -> jnp.ndarray:
    """(n, n) banded gaussian-blur matrix (same coefficients as the separable
    window; border rows are truncated and masked out in ssim)."""
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    idx = jnp.arange(n)
    offs = idx[:, None] - idx[None, :] + (size - 1) // 2        # (n, n)
    inband = (offs >= 0) & (offs < size)
    return jnp.where(inband, g[jnp.clip(offs, 0, size - 1)], 0.0)


def ssim(pred: jnp.ndarray, target: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Windowed SSIM over (H, W, C) images in [0, 1].

    TPU-first formulation: the separable gaussian window is applied as two
    banded matmuls (blur_H @ img @ blur_W^T), which runs on the MXU.  A
    depthwise-conv formulation pads C=3 channels to the 128-lane tile on
    TPU and is dramatically slower.  Border rows/cols (half-window) are
    excluded from the mean, matching a VALID-padded window.
    """
    H, W, C = pred.shape
    bh = _band_matrix(H, window_size, 1.5)                      # (H, H)
    bw = _band_matrix(W, window_size, 1.5)                      # (W, W)

    def filt(img):                                              # (H, W, C)
        # Precision.HIGHEST is load-bearing: with the TPU default the MXU
        # rounds inputs to bf16, and the windowed variance below
        # (E[x^2] - mu^2) cancels catastrophically — sig_x + sig_y + c2
        # goes negative on smooth regions and SSIM explodes (observed as
        # negative training losses at 256^2 on real hardware).
        y = jnp.einsum("hk,kwc->hwc", bh, img,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("hkc,wk->hwc", y, bw,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

    mu_x = filt(pred)
    mu_y = filt(target)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    # clamp: windowed variance is mathematically >= 0
    sig_x = jnp.maximum(filt(pred * pred) - mu_x2, 0.0)
    sig_y = jnp.maximum(filt(target * target) - mu_y2, 0.0)
    sig_xy = filt(pred * target) - mu_xy

    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    s = ((2 * mu_xy + c1) * (2 * sig_xy + c2)) / (
        (mu_x2 + mu_y2 + c1) * (sig_x + sig_y + c2)
    )
    half = window_size // 2
    interior = s[half : H - half, half : W - half]
    return jnp.mean(interior)


def dssim_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return (1.0 - ssim(pred, target)) / 2.0


def psnr(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))
