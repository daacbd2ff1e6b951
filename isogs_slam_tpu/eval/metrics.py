"""Evaluation metrics: PSNR, (MS-)SSIM, depth RMSE/L1, ATE RMSE.

Follows utils/eval_helpers.py: PSNR via the per-channel-MSE formula of
calc_psnr (slam_external.py:49-51); ATE via Horn closed-form alignment
(eval_helpers.py:24-78, numpy SVD).

LPIPS: the reference uses torchmetrics' AlexNet LPIPS
(eval_helpers.py:21-22). Pretrained AlexNet weights cannot be downloaded in
this environment (zero egress); `lpips()` loads weights from
$ISOGS_LPIPS_WEIGHTS (an .npz export) when present and otherwise returns
NaN, which eval reports as missing rather than substituting a different
metric silently.
"""
from __future__ import annotations

import os

import numpy as np

from ..ops.ssim import ms_ssim as _ms_ssim_jax  # noqa: F401 (re-export)


def psnr(img1: np.ndarray, img2: np.ndarray) -> float:
    """img [C,H,W] in [0,1]; mean over per-channel 20log10(1/sqrt(mse))."""
    a = np.asarray(img1, np.float64).reshape(img1.shape[0], -1)
    b = np.asarray(img2, np.float64).reshape(img2.shape[0], -1)
    mse = ((a - b) ** 2).mean(axis=1)
    return float((20.0 * np.log10(1.0 / np.sqrt(np.maximum(mse, 1e-20))))
                 .mean())


def horn_align(model: np.ndarray, data: np.ndarray):
    """Horn closed-form alignment of 3xN trajectories -> (R, t, errors)."""
    mu_m = model.mean(axis=1, keepdims=True)
    mu_d = data.mean(axis=1, keepdims=True)
    mz = model - mu_m
    dz = data - mu_d
    W = mz @ dz.T
    U, _, Vh = np.linalg.svd(W.T)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vh) < 0:
        S[2, 2] = -1
    R = U @ S @ Vh
    t = mu_d - R @ mu_m
    aligned = R @ model + t
    err = np.sqrt(((aligned - data) ** 2).sum(axis=0))
    return R, t, err


def evaluate_ate(gt_traj: list, est_traj: list) -> float:
    """Mean translational error after Horn alignment, in meters
    (eval_helpers.evaluate_ate:61-78)."""
    gt = np.stack([np.asarray(g)[:3, 3] for g in gt_traj]).T
    est = np.stack([np.asarray(e)[:3, 3] for e in est_traj]).T
    _, _, err = horn_align(gt, est)
    return float(err.mean())


# ---------------------------------------------------------------- LPIPS
_LPIPS_NET = None
_LPIPS_VARIANT = None


def lpips_variant() -> str:
    """Which LPIPS is in effect: "alex" (pretrained export), "rand-alexnet"
    (seeded random-feature fallback), or "none" (NaN reported)."""
    path = os.environ.get("ISOGS_LPIPS_WEIGHTS", "")
    if path and os.path.exists(path):
        return "alex"
    if os.environ.get("ISOGS_LPIPS_FALLBACK", "random") != "none":
        return "rand-alexnet"
    return "none"


def lpips(img1: np.ndarray, img2: np.ndarray) -> float:
    """AlexNet LPIPS from a weight export when available; otherwise a
    seeded random-feature AlexNet (LPIPSAlex.random — finite, deterministic,
    labeled distinctly in eval output). Set ISOGS_LPIPS_FALLBACK=none to get
    NaN instead of the substitution."""
    global _LPIPS_NET, _LPIPS_VARIANT
    variant = lpips_variant()
    if variant == "none":
        return float("nan")
    if _LPIPS_NET is None or _LPIPS_VARIANT != variant:
        from .lpips_jax import LPIPSAlex
        if variant == "alex":
            _LPIPS_NET = LPIPSAlex(os.environ["ISOGS_LPIPS_WEIGHTS"])
        else:
            _LPIPS_NET = LPIPSAlex.random(seed=0)
        _LPIPS_VARIANT = variant
    return float(_LPIPS_NET(img1, img2))
