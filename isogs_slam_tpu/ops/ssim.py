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


@functools.lru_cache(maxsize=None)
def _band_matrix(n: int, window_size: int, sigma: float, pad_lo: int,
                 pad_hi: int) -> np.ndarray:
    """1D gaussian filter as a dense band matrix [n_out, n]: row i holds
    the taps for output sample i under (pad_lo, pad_hi) zero padding."""
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    g = (g / g.sum()).astype(np.float32)
    n_out = n + pad_lo + pad_hi - window_size + 1
    m = np.zeros((n_out, n), np.float32)
    for i in range(n_out):
        for t in range(window_size):
            j = i - pad_lo + t
            if 0 <= j < n:
                m[i, j] = g[t]
    return m


def _depthwise_filter(img: jnp.ndarray, window: jnp.ndarray,
                      padding, sigma: float = 1.5,
                      precision=None) -> jnp.ndarray:
    """img [..., H, W] -> per-channel 2D gaussian filtering.

    The gaussian window is rank-1 (outer(g, g)), so the 2D filter is two
    separable 1D passes; each pass runs as a dense band-matrix matmul —
    a 3-channel depthwise conv leaves the TPU's 128-wide lanes almost
    idle, while [H_out, H] x [H, W*C-ish] matmuls ride the MXU (exact
    same f32 math, ~8x faster at 680x1200). Leading dims are batched, so
    callers stack all their filter inputs into one call."""
    k = window.shape[0]
    H, W = img.shape[-2], img.shape[-1]
    gv = jnp.asarray(_band_matrix(H, k, sigma, padding[0][0],
                                  padding[0][1]))
    gh = jnp.asarray(_band_matrix(W, k, sigma, padding[1][0],
                                  padding[1][1]))
    tmp = jnp.einsum("ih,...hw->...iw", gv, img,
                     preferred_element_type=img.dtype,
                     precision=precision)
    return jnp.einsum("jw,...iw->...ij", gh, tmp,
                      preferred_element_type=img.dtype,
                      precision=precision)


def ssim_map(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
             padding="SAME") -> jnp.ndarray:
    """Per-position SSIM map over [..., H, W] images in [0, 1].

    SAME padding zero-pads (the Inria conv2d semantics,
    utils/slam_external.py:66-97): boundary windows keep un-renormalized
    taps, so a stripe whose out-of-image pixels are zeroed produces
    bit-identical values to the full-image computation at every interior
    window position (the fast-mapping stripe estimator relies on this)."""
    w = jnp.asarray(_gaussian_window(window_size), img1.dtype)
    pad = ([(window_size // 2, window_size // 2)] * 2
           if padding == "SAME" else padding)
    stack = jnp.stack([img1, img2, img1 * img1, img2 * img2, img1 * img2])
    f = _depthwise_filter(stack, w, pad)           # one batched filtering
    mu1, mu2 = f[0], f[1]
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = f[2] - mu1_sq
    s2 = f[3] - mu2_sq
    s12 = f[4] - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    return ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1)
                                                 * (s1 + s2 + c2))


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         padding="SAME") -> jnp.ndarray:
    """Mean SSIM over [C, H, W] images in [0, 1]."""
    return ssim_map(img1, img2, window_size, padding).mean()


calc_ssim = ssim  # reference-name alias


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def ms_ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11):
    """Multi-scale SSIM over [C, H, W] in [0, 1] (pytorch_msssim semantics:
    valid-padding gaussian filter, 2x avg-pool between scales, contrast
    sensitivity at coarse scales, relu-clamped).

    pytorch_msssim asserts the image is larger than (win-1) * 2^4; for
    smaller images the scale count is reduced (weights renormalized) so
    small-resolution eval runs don't produce NaN.

    Computed in f32 at HIGHEST matmul precision regardless of input
    dtype: the variance terms (E[x^2] - mu^2) cancel catastrophically
    when the filter matmuls run at the TPU default precision (f32
    operands truncated to bf16), and the resulting noisy cs-ratios are
    upward-biased — measured MS-SSIM values > 1.0 on real TPU runs.
    This is a metric function (eval-only; the mapping-loss `ssim` path
    is separate), so the 3-pass f32 emulation cost is irrelevant."""
    img1 = jnp.asarray(img1, jnp.float32)
    img2 = jnp.asarray(img2, jnp.float32)
    w = jnp.asarray(_gaussian_window(window_size), img1.dtype)
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    smaller = min(img1.shape[-2], img1.shape[-1])
    n_scales_fit = 1
    while (n_scales_fit < len(_MSSSIM_WEIGHTS)
           and smaller // (2 ** n_scales_fit) >= window_size):
        n_scales_fit += 1

    def one_scale(a, b):
        stack = jnp.stack([a, b, a * a, b * b, a * b])
        f = _depthwise_filter(stack, w, [(0, 0), (0, 0)],
                              precision=jax.lax.Precision.HIGHEST)
        mu1, mu2 = f[0], f[1]
        mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        s1 = f[2] - mu1_sq
        s2 = f[3] - mu2_sq
        s12 = f[4] - mu12
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
