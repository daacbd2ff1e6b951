"""Naive per-pixel numpy rasterizer — the correctness oracle.

Implements the *sequential* front-to-back compositing algorithm of the CUDA
`diff-gaussian-rasterization` kernels (the package consumed at
python_ordinary/scripts/splatam.py:39) literally: per pixel, iterate the
depth-sorted Gaussians whose tile rect covers the pixel's tile, with the
exact skip/termination rules. O(N * pixels) — test-scale scenes only.

This file exists so the fast TPU renderer in rasterize.py can be validated
against an independent implementation of the same math (the role
cpp/tests/grad_check.cpp plays in the reference tree).
"""
from __future__ import annotations

import numpy as np

TILE = 16
NEAR_CULL_Z = 0.2
LOW_PASS = 0.3


def _quat_to_rotmat(q):
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
        2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
        2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
    ], axis=-1).reshape(q.shape[:-1] + (3, 3))
    return R


def render_reference(means_cam, quats, log_scales, logit_opacities, features,
                     fx, fy, cx, cy, width, height, dtype=np.float64):
    """Returns (image [F, H, W], radii [N] int, final_T [H, W]).

    Run with dtype=float64 to compare against the fast renderer in x64 mode
    (algorithmic equivalence, tight tolerance); f32 comparisons are only
    loose smoke checks because independent f32 op orders round differently
    around the alpha-skip thresholds.
    """
    means_cam = np.asarray(means_cam, dtype)
    quats = np.asarray(quats, dtype)
    scales = np.exp(np.asarray(log_scales, dtype))
    opac = 1.0 / (1.0 + np.exp(-np.asarray(logit_opacities, dtype)[:, 0]))
    features = np.asarray(features, dtype)
    N, F = features.shape

    tanfovx = width / (2.0 * fx)
    tanfovy = height / (2.0 * fy)
    gx = (width + TILE - 1) // TILE
    gy = (height + TILE - 1) // TILE

    u = np.zeros(N)
    v = np.zeros(N)
    conic = np.zeros((N, 3))
    radius = np.zeros(N, np.int64)
    rect = np.zeros((N, 4), np.int64)
    ok = np.zeros(N, bool)

    for i in range(N):
        x, y, z = means_cam[i]
        if z <= NEAR_CULL_Z:
            continue
        R = _quat_to_rotmat(quats[i])
        RS = R * scales[i][None, :]
        sigma = RS @ RS.T
        limx, limy = 1.3 * tanfovx, 1.3 * tanfovy
        txc = np.clip(x / z, -limx, limx) * z
        tyc = np.clip(y / z, -limy, limy) * z
        J = np.array([[fx / z, 0, -fx * txc / z ** 2],
                      [0, fy / z, -fy * tyc / z ** 2]])
        cov = J @ sigma @ J.T
        cov[0, 0] += LOW_PASS
        cov[1, 1] += LOW_PASS
        det = cov[0, 0] * cov[1, 1] - cov[0, 1] ** 2
        if det == 0:
            continue
        conic[i] = [cov[1, 1] / det, -cov[0, 1] / det, cov[0, 0] / det]
        mid = 0.5 * (cov[0, 0] + cov[1, 1])
        lam1 = mid + np.sqrt(max(mid * mid - det, 0.1))
        r = int(np.ceil(3.0 * np.sqrt(max(lam1, 0.0))))
        # consistent OpenCV pixel-center convention (see rasterize.py note;
        # the CUDA ndc2Pix lands at cx - 0.5, half a pixel off the pinhole
        # model the rest of the pipeline uses)
        u[i] = fx * x / (z + 1e-7) + cx
        v[i] = fy * y / (z + 1e-7) + cy
        x0 = min(gx, max(0, int((u[i] - r) / TILE)))
        y0 = min(gy, max(0, int((v[i] - r) / TILE)))
        x1 = min(gx, max(0, int((u[i] + r + TILE - 1) / TILE)))
        y1 = min(gy, max(0, int((v[i] + r + TILE - 1) / TILE)))
        if (x1 - x0) * (y1 - y0) == 0 or r == 0:
            continue
        radius[i] = r
        rect[i] = [x0, y0, x1, y1]
        ok[i] = True

    order = np.argsort(np.where(ok, means_cam[:, 2], np.inf), kind="stable")
    img = np.zeros((height, width, F))
    final_t = np.ones((height, width))

    for py in range(height):
        ty = py // TILE
        for px in range(width):
            tx = px // TILE
            T = 1.0
            acc = np.zeros(F)
            for gi in order:
                if not ok[gi]:
                    break
                x0, y0, x1, y1 = rect[gi]
                if not (x0 <= tx < x1 and y0 <= ty < y1):
                    continue
                dx = u[gi] - px
                dy = v[gi] - py
                A, B, Cc = conic[gi]
                power = -0.5 * (A * dx * dx + Cc * dy * dy) - B * dx * dy
                if power > 0:
                    continue
                alpha = min(0.99, opac[gi] * np.exp(power))
                if alpha < 1.0 / 255.0:
                    continue
                test_t = T * (1 - alpha)
                if test_t < 1e-4:
                    break
                acc += features[gi] * alpha * T
                T = test_t
            img[py, px] = acc
            final_t[py, px] = T

    return img.transpose(2, 0, 1), radius, final_t
