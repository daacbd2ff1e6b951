"""Quaternion / SE(3) helpers (JAX).

Semantics mirror the reference implementation's helpers
(`python_ordinary/utils/slam_external.py:25-42` build_rotation,
`python_ordinary/utils/slam_helpers.py:21-28` quat_mult,
`python_ordinary/utils/slam_helpers.py:43-103` matrix_to_quaternion)
but are written as pure jnp functions usable under jit/vmap/grad.

Quaternions are (w, x, y, z), real part first, matching the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(q: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along `axis` (torch.nn.functional.normalize semantics).

    The clamp goes INSIDE the sqrt: sqrt(x) has a NaN gradient at x = 0, and
    all-zero rows (dead Gaussian slots) otherwise poison any gradient that
    touches them even when masked downstream (0 * NaN = NaN)."""
    n2 = jnp.sum(q * q, axis=axis, keepdims=True)
    return q / jnp.sqrt(jnp.maximum(n2, eps * eps))


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] unit-or-unnormalized quaternion -> [..., 3, 3] rotation.

    Normalizes internally, like the reference `build_rotation`.
    """
    q = normalize(q)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1)
    row1 = jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1)
    row2 = jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


# Alias with the reference's name so call sites read like the spec.
build_rotation = quat_to_rotmat


def quat_mult(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, broadcasting over leading dims. [...,4]x[...,4]->[...,4]."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    y = w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2
    z = w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2
    return jnp.stack([w, x, y, z], axis=-1)


def _sqrt_positive_part(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x > 0, jnp.sqrt(jnp.maximum(x, 0.0)), 0.0)


def rotmat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] rotation -> [..., 4] (w,x,y,z) quaternion.

    Best-conditioned-candidate algorithm (pytorch3d style), matching
    `matrix_to_quaternion` in the reference.
    """
    batch = m.shape[:-2]
    f = m.reshape(batch + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = [f[..., i] for i in range(9)]
    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )
    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )
    denom = 2.0 * jnp.maximum(q_abs[..., None], 0.1)
    quat_candidates = quat_by_rijk / denom
    best = jnp.argmax(q_abs, axis=-1)
    return jnp.take_along_axis(
        quat_candidates, best[..., None, None].repeat(4, axis=-1), axis=-2
    )[..., 0, :]


def pose_to_w2c(cam_quat: jnp.ndarray, cam_trans: jnp.ndarray) -> jnp.ndarray:
    """(quat [4], trans [3]) -> 4x4 world-to-camera matrix.

    Mirrors `transform_to_frame` (slam_helpers.py:265-274): the tracked
    per-frame pose parameterizes w2c directly.
    """
    R = quat_to_rotmat(cam_quat)
    w2c = jnp.eye(4, dtype=cam_quat.dtype)
    w2c = w2c.at[:3, :3].set(R)
    w2c = w2c.at[:3, 3].set(cam_trans)
    return w2c


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 homogeneous transform to [N, 3] points -> [N, 3]."""
    return pts @ T[:3, :3].T + T[:3, 3]


def transform_to_frame(means3d, unnorm_rots, cam_quat, cam_trans,
                       gaussians_grad: bool, camera_grad: bool):
    """World -> camera-frame transform of Gaussian means and orientation quats.

    Matches `transform_to_frame` (slam_helpers.py:252-304): the camera pose
    (quat, trans) defines w2c; quats are rotated by quat_mult(cam_rot, q).
    Gradient selection is done via stop_gradient, the jnp analog of the
    reference's `.detach()` pattern.
    """
    if not camera_grad:
        cam_quat = jax.lax.stop_gradient(cam_quat)
        cam_trans = jax.lax.stop_gradient(cam_trans)
    if not gaussians_grad:
        means3d = jax.lax.stop_gradient(means3d)
        unnorm_rots = jax.lax.stop_gradient(unnorm_rots)
    cam_quat_n = normalize(cam_quat)
    w2c = pose_to_w2c(cam_quat_n, cam_trans)
    means_cam = transform_points(w2c, means3d)
    rots_cam = quat_mult(cam_quat_n[None, :], normalize(unnorm_rots))
    return means_cam, rots_cam


def relative_transformation(t1: jnp.ndarray, t2: jnp.ndarray) -> jnp.ndarray:
    """T s.t. T @ t1 == t2, i.e. inv(t1) @ t2 — pose normalization used by the
    dataset layer (geometryutils.py relative_transformation)."""
    R1 = t1[..., :3, :3]
    tr1 = t1[..., :3, 3]
    R1_inv = jnp.swapaxes(R1, -1, -2)
    t1_inv = -(R1_inv @ tr1[..., None])[..., 0]
    R = R1_inv @ t2[..., :3, :3]
    t = (R1_inv @ t2[..., :3, 3][..., None])[..., 0] + t1_inv
    out = jnp.zeros_like(t1)
    out = out.at[..., :3, :3].set(R)
    out = out.at[..., :3, 3].set(t)
    out = out.at[..., 3, 3].set(1.0)
    return out
