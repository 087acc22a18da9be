"""Loss library (reference utils/loss_utils.py + fused-ssim role).

SSIM is an XLA depthwise convolution — on TPU the 11x11 window conv lowers to
the MXU and fuses with the elementwise SSIM formula; this is the TPU-native
counterpart of the fused-ssim CUDA extension (train.py:38,170). Differentiable
end-to-end, same constants as the reference torch implementation
(utils/loss_utils.py:46-96: window 11, sigma 1.5, C1=0.01^2, C2=0.03^2).

Images are channels-last [H, W, C] (or [B, H, W, C])."""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def l2_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def psnr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((a - b) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


def smooth_loss(disp: jnp.ndarray, img: jnp.ndarray) -> jnp.ndarray:
    """Edge-aware second-order disparity smoothness (reference
    utils/loss_utils.py:51-58). disp [H,W] or [H,W,1], img [H,W,C],
    channels-last."""
    if disp.ndim == 3:
        disp = disp[..., 0]
    gx = jnp.abs(disp[1:-1, :-2] + disp[1:-1, 2:] - 2 * disp[1:-1, 1:-1])
    gy = jnp.abs(disp[:-2, 1:-1] + disp[2:, 1:-1] - 2 * disp[1:-1, 1:-1])
    ix = jnp.mean(jnp.abs(img[1:-1, :-2] - img[1:-1, 2:]), axis=-1) * 0.5
    iy = jnp.mean(jnp.abs(img[:-2, 1:-1] - img[2:, 1:-1]), axis=-1) * 0.5
    return jnp.mean(gx * jnp.exp(-ix)) + jnp.mean(gy * jnp.exp(-iy))


def _gaussian_window(size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)  # [size, size]


def _depthwise_conv(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """img [B,H,W,C], window [k,k] -> same-padded depthwise conv."""
    c = img.shape[-1]
    k = window.shape[0]
    kernel = jnp.broadcast_to(window[:, :, None, None], (k, k, 1, c))
    return jax.lax.conv_general_dilated(
        img,
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
    return_map: bool = False,
):
    """Mean SSIM (or map) over channels-last images [H,W,C] / [B,H,W,C]."""
    squeeze = img1.ndim == 3
    if squeeze:
        img1, img2 = img1[None], img2[None]
    w = _gaussian_window(window_size, sigma)
    mu1 = _depthwise_conv(img1, w)
    mu2 = _depthwise_conv(img2, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_conv(img1 * img1, w) - mu1_sq
    sigma2_sq = _depthwise_conv(img2 * img2, w) - mu2_sq
    sigma12 = _depthwise_conv(img1 * img2, w) - mu12
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    if return_map:
        return ssim_map[0] if squeeze else ssim_map
    return jnp.mean(ssim_map)
