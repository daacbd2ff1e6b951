"""SSIM / MS-SSIM / PSNR image metrics in JAX.

`calc_ssim` reproduces the Inria gaussian-window SSIM used in the mapping
loss (utils/slam_external.py:54-97): 11x11 window, sigma 1.5, SAME padding,
per-channel depthwise convolution. `ms_ssim` reproduces pytorch_msssim's
5-scale variant used by eval (utils/eval_helpers.py:518).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _gaussian_window(window_size: int = 11, sigma: float = 1.5):
    """Cached as numpy — a cached jnp array created inside one trace would
    leak that trace's tracer into later jit/vmap transformations."""
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def _depthwise_filter(img: jnp.ndarray, window: jnp.ndarray,
                      padding) -> jnp.ndarray:
    """img [C, H, W] -> per-channel 2D convolution.

    The gaussian window is rank-1 (outer(g, g)), so the 2D filter runs as
    two separable 1D passes — 2k taps instead of k^2 (the 11x11 full conv
    on 3-channel images was a hot spot of the mapping loss on TPU)."""
    C = img.shape[0]
    k = window.shape[0]
    # window == outer(g, g) with g normalized; recover g from the window
    g = jnp.sqrt(jnp.maximum(jnp.diag(window), 0.0))
    g = g / jnp.sum(g)
    lhs = img[None]                                     # [1, C, H, W]
    rv = jnp.tile(g.reshape(1, 1, k, 1), (C, 1, 1, 1))  # vertical taps
    rh = jnp.tile(g.reshape(1, 1, 1, k), (C, 1, 1, 1))  # horizontal taps
    pad_v = [padding[0], (0, 0)]
    pad_h = [(0, 0), padding[1]]
    out = jax.lax.conv_general_dilated(
        lhs, rv, window_strides=(1, 1), padding=pad_v,
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C)
    out = jax.lax.conv_general_dilated(
        out, rh, window_strides=(1, 1), padding=pad_h,
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C)
    return out[0]


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         padding="SAME") -> jnp.ndarray:
    """Mean SSIM over [C, H, W] images in [0, 1]."""
    w = jnp.asarray(_gaussian_window(window_size), img1.dtype)
    pad = ([(window_size // 2, window_size // 2)] * 2
           if padding == "SAME" else padding)
    filt = lambda x: _depthwise_filter(x, w, pad)
    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(img1 * img1) - mu1_sq
    s2 = filt(img2 * img2) - mu2_sq
    s12 = filt(img1 * img2) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1)
                                              * (s1 + s2 + c2))
    return m.mean()


calc_ssim = ssim  # reference-name alias


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def ms_ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11):
    """Multi-scale SSIM over [C, H, W] in [0, 1] (pytorch_msssim semantics:
    valid-padding gaussian filter, 2x avg-pool between scales, contrast
    sensitivity at coarse scales, relu-clamped).

    pytorch_msssim asserts the image is larger than (win-1) * 2^4; for
    smaller images the scale count is reduced (weights renormalized) so
    small-resolution eval runs don't produce NaN."""
    w = jnp.asarray(_gaussian_window(window_size), img1.dtype)
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    smaller = min(img1.shape[-2], img1.shape[-1])
    n_scales_fit = 1
    while (n_scales_fit < len(_MSSSIM_WEIGHTS)
           and smaller // (2 ** n_scales_fit) >= window_size):
        n_scales_fit += 1

    def one_scale(a, b):
        filt = lambda x: _depthwise_filter(x, w, [(0, 0), (0, 0)])
        mu1, mu2 = filt(a), filt(b)
        mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        s1 = filt(a * a) - mu1_sq
        s2 = filt(b * b) - mu2_sq
        s12 = filt(a * b) - mu12
        cs = ((2 * s12 + c2) / (s1 + s2 + c2)).mean()
        ssim_v = (((2 * mu12 + c1) * (2 * s12 + c2))
                  / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))).mean()
        return ssim_v, cs

    def pool2(x):
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 2), (1, 2, 2), "VALID") / 4.0

    vals = []
    a, b = img1, img2
    n_scales = n_scales_fit
    for i in range(n_scales):
        ssim_v, cs = one_scale(a, b)
        vals.append(ssim_v if i == n_scales - 1 else cs)
        if i < n_scales - 1:
            a, b = pool2(a), pool2(b)
    vals = jnp.stack([jax.nn.relu(v) for v in vals])
    weights = jnp.asarray(_MSSSIM_WEIGHTS[:n_scales], img1.dtype)
    weights = weights / jnp.sum(weights)
    return jnp.prod(vals ** weights)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Per-image PSNR, matching calc_psnr (slam_external.py:49-51):
    mean over a per-channel-mse -> 20 log10(1/sqrt(mse)) vector."""
    mse = ((img1 - img2) ** 2).reshape(img1.shape[0], -1).mean(axis=1)
    return (20.0 * jnp.log10(1.0 / jnp.sqrt(mse))).mean()
