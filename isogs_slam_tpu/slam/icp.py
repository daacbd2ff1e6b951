"""Point-to-plane ICP Gauss-Newton pose polish (opt-in tracking refinement).

The photometric tracking loop (slam/tracking.py) is first-order Adam on
L1 losses, which bounces at lr scale near the optimum and carries a
rotation-translation trough bias (NOTES.md: the same physics bounds the
reference at ~0.28 cm ATE, splatam.py:1247-1317). This module adds the
classic projective-ICP second-order step on the DEPTH channel: render the
map's depth at the current pose (forward only — no autodiff through the
rasterizer), back-project both rendered and measured depth, and take
damped Gauss-Newton steps on the point-to-plane residual with the
analytic SE(3) Jacobian. One slot-table render per iteration; everything
else is elementwise + a 6x6 solve.

Geometry. The tracked pose (quat, trans) parameterizes w2c
(utils/transforms.pose_to_w2c). A left-multiplied camera-frame increment
Exp(delta) updates w2c_new = Exp(delta) @ w2c. Measured points X (gt
depth back-projected) live in the sensor = camera frame and do NOT move
with delta; rendered model points Y correspond to fixed world geometry,
so their camera coordinates move: Y(delta) = Exp(delta) Y. Hence

    r(delta) = n . (Exp(delta) Y - X)  ~=  n . (Y + omega x Y + t - X)
    J_omega = Y x n,   J_t = n,        r0 = n . (Y - X)

with n the model-surface normal from finite differences of Y. This is a
deliberate capability the reference does not have (its C++ tracker is
degraded, cpp/src/slam/tracker.cpp:49-55); enabled by tracking.gn_iters.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..ops.rasterize import RasterConfig
from ..utils.transforms import quat_mult, quat_to_rotmat


class GNConfig(NamedTuple):
    iters: int = 0               # 0 = off
    damping: float = 1e-3        # LM damping relative to diag(JtJ)
    reject_factor: float = 10.0  # drop residuals > factor * median
    sil_thres: float = 0.9       # model-confidence gate on rendered depth
    min_normal_dot: float = 0.1  # reject grazing normals (|n . view|)
    # relative eigenvalue floor for the 6x6 solve: step only in pose
    # directions the point-to-plane residual actually observes. On
    # planar-dominant scenes (one wall filling the view) JtJ is rank ~3:
    # translations in the wall plane and the in-plane rotation have
    # near-zero curvature, and an LM-damped solve still walks along them
    # chasing residual noise (the tangential-slide failure). Eigencut
    # zeroes those components instead of damping them. 0 disables.
    eig_floor: float = 1e-4


def _exp_quat(omega: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [3] -> unit quaternion (w,x,y,z), exact exp map with the
    small-angle-safe sinc form."""
    theta2 = jnp.sum(omega * omega)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    half = 0.5 * theta
    # sin(t/2)/t, series-safe at t -> 0
    s = jnp.where(theta2 > 1e-12, jnp.sin(half) / theta, 0.5 - theta2 / 48.0)
    return jnp.concatenate([jnp.cos(half)[None], s * omega])


def apply_increment(quat: jnp.ndarray, trans: jnp.ndarray,
                    delta: jnp.ndarray):
    """Left-multiply w2c by Exp(delta), delta = (omega[3], t[3]):
    R' = dR R, t' = dR t + dt."""
    dq = _exp_quat(delta[:3])
    dR = quat_to_rotmat(dq)
    return quat_mult(dq, quat), dR @ trans + delta[3:]


def backproject_grid(depth: jnp.ndarray, cam: Camera) -> jnp.ndarray:
    """[H, W] depth -> [H, W, 3] camera-frame points (pinhole, z forward;
    pixel centers at integer coords, matching rasterize.py:116-123)."""
    H, W = depth.shape
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    x = (u - cam.cx) / cam.fx * depth
    y = (v - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def normals_from_points(pts: jnp.ndarray, valid: jnp.ndarray):
    """Central-difference surface normals of an organized point grid.
    pts [H, W, 3], valid [H, W] -> (normals [H, W, 3] unit, ok [H, W]).
    Normals are oriented toward the camera (n . p < 0 flipped)."""
    du = jnp.roll(pts, -1, axis=1) - jnp.roll(pts, 1, axis=1)
    dv = jnp.roll(pts, -1, axis=0) - jnp.roll(pts, 1, axis=0)
    ok = (valid
          & jnp.roll(valid, -1, axis=1) & jnp.roll(valid, 1, axis=1)
          & jnp.roll(valid, -1, axis=0) & jnp.roll(valid, 1, axis=0))
    # roll wraps: borders are never ok
    ok = ok.at[0, :].set(False).at[-1, :].set(False)
    ok = ok.at[:, 0].set(False).at[:, -1].set(False)
    n = jnp.cross(du, dv)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-12)
    ok = ok & (norm[..., 0] > 1e-12)
    # orient toward camera: the viewing ray is +p, so camera-facing
    # surfaces have n . p < 0
    flip = jnp.sum(n * pts, axis=-1, keepdims=True) > 0
    return jnp.where(flip, -n, n), ok


def _masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    big = jnp.asarray(jnp.inf, x.dtype)
    v = jnp.sort(jnp.where(mask, x, big).ravel())
    cnt = jnp.sum(mask.astype(jnp.int32))
    idx = jnp.clip(cnt // 2, 0, x.size - 1)
    return jnp.where(cnt > 0, v[idx], jnp.asarray(0.0, x.dtype))


def gn_solve(JtJ: jnp.ndarray, Jtr: jnp.ndarray,
             gcfg: GNConfig) -> jnp.ndarray:
    """Damped 6x6 GN solve, optionally restricted to observable directions.

    With eig_floor > 0, solve in the eigenbasis of the block-scaled
    normal matrix and ZERO components whose eigenvalue is below
    eig_floor * lambda_max instead of damping them: a near-null direction
    (flat wall: in-plane translations + in-plane rotation) has ~no signal
    but nonzero noise in Jtr, and a damped inverse amplifies that noise by
    ~1/damping — the measured tangential-slide failure.

    Scaling must NOT be per-axis (Jacobi): on a perfect wall the null
    axes have diag(JtJ) ~ 1e-7 and per-axis normalization rescales them
    to unit curvature, erasing exactly the rank information the cut
    needs (measured: scaled spectrum flat at 0.86-1.0, 5 cm slide
    survives). Instead balance only the rotation block (which scales
    like depth^2, J_omega = Y x n) against the translation block with a
    characteristic depth from the block traces, preserving within-block
    eigenvalue ratios."""
    if gcfg.eig_floor <= 0.0:
        lm = gcfg.damping * jnp.diag(jnp.diag(JtJ)) + 1e-9 * jnp.eye(6)
        return -jnp.linalg.solve(JtJ + lm, Jtr)
    d = jnp.diag(JtJ)
    rho = jnp.sqrt(jnp.maximum(d[0] + d[1] + d[2], 1e-12)
                   / jnp.maximum(d[3] + d[4] + d[5], 1e-12))
    s = jnp.concatenate([jnp.full((3,), 1.0 / rho), jnp.ones((3,))])
    A = JtJ * s[:, None] * s[None, :]
    lam, V = jnp.linalg.eigh(A)                     # ascending
    keep = lam > gcfg.eig_floor * lam[-1]
    inv = jnp.where(keep, 1.0 / (lam + gcfg.damping * lam[-1]), 0.0)
    b = V.T @ (s * Jtr)
    return -s * (V @ (inv * b))


def gn_depth_polish(raw: jnp.ndarray, counts: jnp.ndarray,
                    quat: jnp.ndarray, trans: jnp.ndarray,
                    gt_depth: jnp.ndarray, cam: Camera,
                    rcfg: RasterConfig, gcfg: GNConfig):
    """Damped point-to-plane GN refinement of (quat, trans) against the
    frozen slot-table map render. gt_depth [1, H, W]. Returns
    (quat, trans, cost0, cost1): the polished pose plus the point-to-plane
    RMS before/after — the caller accepts the polish only when cost1 <
    cost0 (the photometric loss cannot arbitrate here: its minimum IS the
    few-mm trough bias this step corrects)."""
    from ..ops.rasterize import render_rgbd_sil_slots

    gt_d = jax.lax.stop_gradient(gt_depth[0])
    meas_valid = (gt_d > 0) & jnp.isfinite(gt_d)
    X = backproject_grid(gt_d, cam)                     # sensor frame: fixed

    def linearize(q, t):
        """One render -> (JtJ [6,6], Jtr [6], p2p RMS, ok count)."""
        _, depth, sil, _, _ = render_rgbd_sil_slots(
            raw, counts, q, t, cam, rcfg)
        sil = jax.lax.stop_gradient(sil)
        # The composited depth channel is sum(w_i z_i) with sum(w_i) =
        # silhouette (rasterize.render_rgbd_sil), i.e. SILHOUETTE-SCALED:
        # on iso-regularized walls (sil ~0.85-0.95) the raw channel sits
        # 5-15% closer than the surface. gt_depth is SENSOR depth, so
        # aligning to the raw channel drags the pose toward a shrunk
        # surface every frame — measured 73 cm ATE over 30 full-res
        # frames while p2p RMS and the photometric guard both stayed
        # happy (the map bakes the drift in). Normalize to the
        # conditional expected depth E[z | hit] = depth / sil.
        d_model = jax.lax.stop_gradient(depth[0]) / jnp.maximum(sil, 1e-6)
        model_valid = ((sil > gcfg.sil_thres) & (d_model > cam.near)
                       & jnp.isfinite(d_model))
        Y = backproject_grid(d_model, cam)
        n, n_ok = normals_from_points(Y, model_valid)

        r = jnp.sum(n * (Y - X), axis=-1)               # [H, W]
        ok = meas_valid & model_valid & n_ok
        # grazing-view rejection: normals nearly orthogonal to the ray
        # carry no depth constraint and amplify association error
        ray = Y / jnp.maximum(jnp.linalg.norm(Y, axis=-1, keepdims=True),
                              1e-12)
        ok = ok & (jnp.abs(jnp.sum(n * ray, axis=-1)) > gcfg.min_normal_dot)
        med = _masked_median(jnp.abs(r), ok)
        ok = ok & (jnp.abs(r) < gcfg.reject_factor * jnp.maximum(med, 1e-6))

        w = ok.astype(jnp.float32)
        cnt = jnp.sum(w)
        cost = jnp.sqrt(jnp.sum(jnp.where(ok, r * r, 0.0))
                        / jnp.maximum(cnt, 1.0))
        J = jnp.concatenate([jnp.cross(Y, n), n], axis=-1)  # [H, W, 6]
        Jf = (J * w[..., None]).reshape(-1, 6)
        rf = (r * w).reshape(-1)
        return Jf.T @ Jf, Jf.T @ rf, cost, cnt

    def body(i, carry):
        q, t, cost0 = carry
        JtJ, Jtr, cost, cnt = linearize(q, t)
        cost0 = jnp.where(i == 0, cost, cost0)
        delta = gn_solve(JtJ, Jtr, gcfg)
        # a catastrophic solve (rank-deficient ok-set) must not fling the
        # pose: cap the update at 5 cm / ~3 deg per iteration
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        dmax = jnp.max(jnp.abs(delta))
        delta = delta * jnp.minimum(1.0, 0.05 / jnp.maximum(dmax, 1e-12))
        q2, t2 = apply_increment(q, t, delta)
        # with no usable constraints keep the pose
        enough = cnt > 64.0
        return (jnp.where(enough, q2, q), jnp.where(enough, t2, t), cost0)

    q1, t1, cost0 = jax.lax.fori_loop(
        0, gcfg.iters, body, (quat, trans, jnp.asarray(jnp.inf)))
    _, _, cost1, cnt1 = linearize(q1, t1)
    cost1 = jnp.where(cnt1 > 64.0, cost1, jnp.inf)
    return q1, t1, cost0, cost1
