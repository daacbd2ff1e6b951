"""Degree-3 real spherical-harmonics color evaluation.

The C++ renderer evaluates 48-coefficient (deg-3) SH per Gaussian before
rasterization (`cpp/src/rendering/renderer.cpp:130-145`, gsplat
`spherical_harmonics_fwd` + the `+0.5` shift and non-negative clamp); the
authoritative Python pipeline stores raw RGB instead, so SH never enters
the SLAM loss. This module provides the TPU-native equivalent for the
parity surfaces that need it: rendering external 3DGS checkpoints /
`sh_coeffs_flat` exports (io/checkpoints.py writes band 0 from rgb), the
PLY interchange, and view-dependent visualization.

Evaluation is a per-Gaussian [N]-vectorized polynomial in the unit view
direction (camera center -> Gaussian mean) — a trivially fused
elementwise pre-pass on TPU; the rasterizer then composites the resulting
per-view colors exactly like stored RGB.

Layout: sh_flat [N, 48] interleaves channel fastest — coefficient k's
RGB lives at columns [3k, 3k+3) (the `sh_coeffs_flat` checkpoint key,
io/checkpoints.py:49-55, matching the C++ loader io.cpp:108-109).
"""
from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)


def eval_sh(sh_flat: jnp.ndarray, dirs: jnp.ndarray,
            deg: int = 3) -> jnp.ndarray:
    """SH -> RGB per Gaussian.

    sh_flat [N, 48] (deg-3; higher-band columns may be zero), dirs [N, 3]
    unnormalized view directions, deg in {0,1,2,3}. Returns [N, 3] colors
    shifted by +0.5 and clamped at 0 (the 3DGS/gsplat convention the C++
    renderer applies, renderer.cpp:137-145)."""
    sh = sh_flat.reshape(sh_flat.shape[0], 16, 3)
    res = C0 * sh[:, 0]
    if deg >= 1:
        n = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        d = dirs / jnp.maximum(n, 1e-12)
        x, y, z = d[:, 0:1], d[:, 1:2], d[:, 2:3]
        res = res - C1 * y * sh[:, 1] + C1 * z * sh[:, 2] \
            - C1 * x * sh[:, 3]
    if deg >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        res = (res + C2[0] * xy * sh[:, 4] + C2[1] * yz * sh[:, 5]
               + C2[2] * (2.0 * zz - xx - yy) * sh[:, 6]
               + C2[3] * xz * sh[:, 7] + C2[4] * (xx - yy) * sh[:, 8])
    if deg >= 3:
        res = (res + C3[0] * y * (3.0 * xx - yy) * sh[:, 9]
               + C3[1] * xy * z * sh[:, 10]
               + C3[2] * y * (4.0 * zz - xx - yy) * sh[:, 11]
               + C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[:, 12]
               + C3[4] * x * (4.0 * zz - xx - yy) * sh[:, 13]
               + C3[5] * z * (xx - yy) * sh[:, 14]
               + C3[6] * x * (xx - yy - 3.0 * zz) * sh[:, 15])
    return jnp.maximum(res + 0.5, 0.0)


def sh_colors_for_pose(sh_flat: jnp.ndarray, means3d: jnp.ndarray,
                       cam_center_world: jnp.ndarray,
                       deg: int = 3) -> jnp.ndarray:
    """View-dependent per-Gaussian colors for one camera pose: direction =
    Gaussian mean - camera center in WORLD frame (renderer.cpp:133-136).
    cam_center_world [3] = -R_w2c^T t (the camera origin in world)."""
    dirs = means3d - cam_center_world[None, :]
    return eval_sh(sh_flat, dirs, deg)


def rgb_to_sh0(rgb: jnp.ndarray) -> jnp.ndarray:
    """[N,3] colors -> [N,48] deg-3 SH with only band 0 set (the inverse
    of eval_sh at any direction when higher bands are zero; the
    checkpoint writer's formula, io/checkpoints.py:49-55)."""
    n = rgb.shape[0]
    sh = jnp.zeros((n, 48), rgb.dtype)
    return sh.at[:, 0:3].set((rgb - 0.5) / C0)
