"""Losses and image metrics: L1, PSNR, SSIM (fused separable), training loss.

Parity targets:
  * l1_loss: mean |a−b|                      (loss_utils.h:30-33)
  * psnr:    10·log10(1/mse)                 (loss_utils.h:35-39)
  * ssim:    11-tap Gaussian window σ=1.5, same padding, C1=0.01², C2=0.03²
             (loss_utils.h:51-128 reference conv SSIM; fused-ssim ssim.cu:8-18
             hardcodes the same separable weights)
  * training loss: (1−λ)·L1 + λ·(1−SSIM), λ=0.2 (gaussian.cpp:691)

The reference ships a dedicated fused-SSIM CUDA kernel (C14) caching ∂SSIM partials
for its backward; on TPU the separable depthwise convolutions below fuse inside XLA
and JAX AD re-derives the same gradients, so no Pallas kernel is needed unless
profiling says otherwise (DESIGN.md §5).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

C1 = 0.01**2
C2 = 0.03**2
_WINDOW_SIZE = 11
_SIGMA = 1.5


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((img1 - img2) ** 2)
    return 10.0 * jnp.log10(1.0 / mse)


def _gaussian_window(window_size: int = _WINDOW_SIZE, sigma: float = _SIGMA) -> np.ndarray:
    """Normalized 1D Gaussian taps (loss_utils.h:51-65 uses x − ws//2)."""
    x = np.arange(window_size, dtype=np.float64) - window_size // 2
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur(img: jnp.ndarray, window=None) -> jnp.ndarray:
    """Separable depthwise 11×11 Gaussian blur, SAME (zero) padding. img: (C, H, W).

    Implemented as 2×11 statically-shifted fused multiply-adds instead of
    lax.conv: dense VPU passes are essentially free on TPU (PERF.md cost
    model) while the tiny-channel depthwise conv lowering was ~2× slower even
    at HIGHEST precision — and, crucially, this keeps every tap in f32. (The
    conv default ran on the MXU in bf16 and the σ² = blur(x²) − μ²
    cancellation went negative on smooth regions; SSIM left [−1, 1] and the
    training loss silently broke — caught by tools/validate_scale.py
    reporting SSIM ≈ 1.9.)"""
    taps = [float(v) for v in _gaussian_window()]
    C, H, W = img.shape
    r = _WINDOW_SIZE // 2
    xp = jnp.pad(img, ((0, 0), (r, r), (0, 0)))
    out = taps[0] * xp[:, 0:H, :]
    for k in range(1, _WINDOW_SIZE):
        out = out + taps[k] * xp[:, k:k + H, :]
    xp = jnp.pad(out, ((0, 0), (0, 0), (r, r)))
    out = taps[0] * xp[:, :, 0:W]
    for k in range(1, _WINDOW_SIZE):
        out = out + taps[k] * xp[:, :, k:k + W]
    return out


def ssim_map(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel SSIM map for (C, H, W) images in [0,1]."""
    window = jnp.asarray(_gaussian_window())
    mu1 = _blur(img1, window)
    mu2 = _blur(img2, window)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _blur(img1 * img1, window) - mu1_sq
    sigma2_sq = _blur(img2 * img2, window) - mu2_sq
    sigma12 = _blur(img1 * img2, window) - mu1_mu2
    return ((2.0 * mu1_mu2 + C1) * (2.0 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )


def ssim(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Mean SSIM (both the training `fused_ssim` and eval `ssim` reduce to .mean())."""
    return jnp.mean(ssim_map(img1, img2))


def training_loss(
    rendered: jnp.ndarray, gt: jnp.ndarray, lambda_dssim: float = 0.2
) -> jnp.ndarray:
    """(1−λ)·L1 + λ·(1−SSIM)  (gaussian.cpp:685-691)."""
    return (1.0 - lambda_dssim) * l1_loss(rendered, gt) + lambda_dssim * (
        1.0 - ssim(rendered, gt)
    )


HALO = _WINDOW_SIZE // 2  # rows of neighbor context one band needs for SSIM


def training_loss_band_part(
    rendered_ext: jnp.ndarray,  # (C, Hb + 2·HALO, W) band + halo rows
    gt_ext: jnp.ndarray,        # (C, Hb + 2·HALO, W) matching GT rows
    n_pixels: int,              # C·H·W of the FULL image
    lambda_dssim: float = 0.2,
) -> jnp.ndarray:
    """Partial training loss for one horizontal band of the image.

    The band image is extended by HALO rows of real neighbor data on each side
    (zeros at the image borders — exactly `_blur`'s SAME zero padding), so the
    band rows of `ssim_map` here equal the corresponding rows of the full-image
    map bit-for-bit. The partial values satisfy

        training_loss(full) = Σ_bands training_loss_band_part(...) + λ·1

    so a sharded caller computes `psum(part) + λ` for the metric while each
    device's gradient flows only through its own band (plus halo cotangents,
    returned to neighbors by the halo exchange's AD transpose)."""
    hb = rendered_ext.shape[1] - 2 * HALO
    diff_sum = jnp.sum(
        jnp.abs(rendered_ext[:, HALO:HALO + hb] - gt_ext[:, HALO:HALO + hb])
    )
    smap = ssim_map(rendered_ext, gt_ext)[:, HALO:HALO + hb]
    return (
        (1.0 - lambda_dssim) * diff_sum - lambda_dssim * jnp.sum(smap)
    ) / n_pixels
