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
    # Photometric block weight for the combined (colored-ICP) solve,
    # relative to the point-to-plane block after per-block robust
    # normalization; 0 = depth-only. MEASURED (full_res 30 frames,
    # NOTES.md session 7): depth-only p2p is structurally drift-prone on
    # low-texture rooms — in-plane pose information exists only in the
    # image, so the combined system is what makes GN full-rank where
    # there is texture (ATE 13.2 cm depth-only w/ eigencut vs 1.22
    # Adam-pyramid; depth L1 0.78 showed the polish was locally perfect
    # while the whole reconstruction drifted). 0.3 measured best on the
    # corner + textured-wall unit scenes: depth rows (exact geometry)
    # keep driving the observable subspace while photometric rows
    # constrain the in-plane null space; >= 1.0 lets photometric
    # linearization error (valid ~1-2 px) dominate and stall convergence
    # (corner: 0.01 mm at 0.3 vs 17 mm at 1.0).
    phot_weight: float = 0.3
    # Per-iteration trust region on the pose increment (meters / rad).
    # The polish's legitimate job is the few-mm trough bias Adam cannot
    # anneal; at full-res scale the map's own reconstruction error
    # dominates the residuals, and a loose cap lets GN absorb map error
    # into the pose every frame (self-consistent gauge drift: measured
    # ATE 13-26 cm with PERFECT local depth alignment, vs 1.22 Adam-only,
    # NOTES.md session 7). A millimeter-scale cap bounds the per-frame
    # damage to the trough-bias scale the step is meant to fix.
    max_step: float = 0.05


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


def _image_grads(im: jnp.ndarray):
    """Central-difference pixel gradients of im [C, H, W] ->
    (gu, gv [C, H, W], ok [H, W] interior mask)."""
    gu = jnp.zeros_like(im)
    gu = gu.at[:, :, 1:-1].set(0.5 * (im[:, :, 2:] - im[:, :, :-2]))
    gv = jnp.zeros_like(im)
    gv = gv.at[:, 1:-1, :].set(0.5 * (im[:, 2:, :] - im[:, :-2, :]))
    H, W = im.shape[1:]
    ok = jnp.zeros((H, W), bool).at[1:-1, 1:-1].set(True)
    return gu, gv, ok


def gn_depth_polish(raw: jnp.ndarray, counts: jnp.ndarray,
                    quat: jnp.ndarray, trans: jnp.ndarray,
                    gt_depth: jnp.ndarray, cam: Camera,
                    rcfg: RasterConfig, gcfg: GNConfig,
                    gt_im: jnp.ndarray | None = None):
    """Damped GN refinement of (quat, trans) against the frozen
    slot-table map render. gt_depth [1, H, W]. Returns
    (quat, trans, cost0, cost1): the polished pose plus the point-to-plane
    RMS before/after — the caller accepts the polish only when cost1 <
    cost0 (the photometric loss cannot arbitrate here: its minimum IS the
    few-mm trough bias this step corrects).

    gt_im [3, H, W] (with gcfg.phot_weight > 0) adds the photometric
    block — the combined colored-ICP/direct-method system. Both blocks
    share the row structure (J = (Y x n_eff, n_eff)): for point-to-plane
    n_eff is the surface normal with residual n.(Y - X); for a
    photometric channel, linearizing I_gt(pi(Exp(delta) Y)) - c_model
    gives n_eff = q = grad(I_gt) . J_pi(Y) with residual
    I_gt(u) - c_model(u). The blocks are robustly normalized (median
    absolute residual) so phot_weight is a dimensionless mix. Depth-only
    p2p is rank ~3 on planar scenes and drifts (see GNConfig.phot_weight);
    the photometric rows carry exactly the missing in-plane information
    wherever the measured image has texture."""
    from ..ops.rasterize import render_rgbd_sil_slots

    gt_d = jax.lax.stop_gradient(gt_depth[0])
    meas_valid = (gt_d > 0) & jnp.isfinite(gt_d)
    X = backproject_grid(gt_d, cam)                     # sensor frame: fixed

    use_phot = gt_im is not None and gcfg.phot_weight > 0.0
    if use_phot:
        gt_p = jax.lax.stop_gradient(gt_im[:3])         # [3, H, W]
        gu, gv, g_ok = _image_grads(gt_p)

    def linearize(q, t):
        """One render -> (JtJ [6,6], Jtr [6], p2p RMS, ok count)."""
        im, depth, sil, _, _ = render_rgbd_sil_slots(
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
        JtJ_d = Jf.T @ Jf
        Jtr_d = Jf.T @ rf
        if not use_phot:
            return JtJ_d, Jtr_d, cost, jnp.asarray(0.0), cnt

        # --- photometric block (colored ICP). The rendered color shares
        # the depth channel's silhouette scaling (sum w_i c_i with
        # sum w_i = sil), so normalize to E[c | hit] like d_model.
        c_model = im / jnp.maximum(sil, 1e-6)[None]          # [3, H, W]
        r_p = gt_p - c_model
        Z = jnp.maximum(Y[..., 2], 1e-6)
        zeros = jnp.zeros_like(Z)
        jpi0 = jnp.stack([cam.fx / Z, zeros,
                          -cam.fx * Y[..., 0] / (Z * Z)], axis=-1)
        jpi1 = jnp.stack([zeros, cam.fy / Z,
                          -cam.fy * Y[..., 1] / (Z * Z)], axis=-1)
        # n_eff per channel: q = gu * dpi_u/dY + gv * dpi_v/dY  [3, H, W, 3]
        qv = (gu[..., None] * jpi0[None] + gv[..., None] * jpi1[None])
        ok_p = (model_valid & g_ok & meas_valid)[None] & jnp.isfinite(r_p)
        med_p = _masked_median(jnp.abs(r_p), ok_p)
        ok_p = ok_p & (jnp.abs(r_p)
                       < gcfg.reject_factor * jnp.maximum(med_p, 1e-6))
        Jp = jnp.concatenate([jnp.cross(Y[None], qv), qv],
                             axis=-1)                        # [3, H, W, 6]
        wp_row = ok_p.astype(jnp.float32)
        Jpf = (Jp * wp_row[..., None]).reshape(-1, 6)
        rpf = (r_p * wp_row).reshape(-1)
        # robust per-block normalization -> phot_weight mixes
        # dimensionless blocks (meters vs intensity)
        wd2 = 1.0 / jnp.maximum(med, 1e-4) ** 2
        wp2 = (gcfg.phot_weight / jnp.maximum(med_p, 1e-3)) ** 2
        JtJ = wd2 * JtJ_d + wp2 * (Jpf.T @ Jpf)
        Jtr = wd2 * Jtr_d + wp2 * (Jpf.T @ rpf)
        cnt_p = jnp.sum(wp_row)
        cost_p = jnp.sqrt(jnp.sum(jnp.where(ok_p, r_p * r_p, 0.0))
                          / jnp.maximum(cnt_p, 1.0))
        return JtJ, Jtr, cost, cost_p, cnt

    def body(i, carry):
        q, t, cost_d0, cost_p0 = carry
        JtJ, Jtr, cost_d, cost_p, cnt = linearize(q, t)
        cost_d0 = jnp.where(i == 0, cost_d, cost_d0)
        cost_p0 = jnp.where(i == 0, cost_p, cost_p0)
        delta = gn_solve(JtJ, Jtr, gcfg)
        # trust region: a catastrophic solve (rank-deficient ok-set) must
        # not fling the pose, and at map scale the cap bounds per-frame
        # map-error absorption (see GNConfig.max_step)
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        dmax = jnp.max(jnp.abs(delta))
        delta = delta * jnp.minimum(
            1.0, gcfg.max_step / jnp.maximum(dmax, 1e-12))
        q2, t2 = apply_increment(q, t, delta)
        # with no usable constraints keep the pose
        enough = cnt > 64.0
        return (jnp.where(enough, q2, q), jnp.where(enough, t2, t),
                cost_d0, cost_p0)

    q1, t1, cost_d0, cost_p0 = jax.lax.fori_loop(
        0, gcfg.iters, body,
        (quat, trans, jnp.asarray(jnp.inf), jnp.asarray(jnp.inf)))
    _, _, cost_d1, cost_p1, cnt1 = linearize(q1, t1)
    if use_phot:
        # acceptance cost = the combined objective the solve minimizes,
        # normalized by the INITIAL per-block RMS so the before/after
        # comparison has fixed scales: cost0 = 1, cost1 < 1 iff the
        # weighted relative residual decreased. (Comparing p2p RMS alone
        # would reject mixed steps that trade a little depth alignment
        # for a photometric gain — the whole point of the combined solve.)
        pw2 = gcfg.phot_weight ** 2
        rel_d = cost_d1 / jnp.maximum(cost_d0, 1e-12)
        rel_p = cost_p1 / jnp.maximum(cost_p0, 1e-12)
        cost0 = jnp.asarray(1.0)
        cost1 = jnp.sqrt((rel_d ** 2 + pw2 * rel_p ** 2) / (1.0 + pw2))
    else:
        cost0, cost1 = cost_d0, cost_d1
    cost1 = jnp.where(cnt1 > 64.0, cost1, jnp.inf)
    return q1, t1, cost0, cost1
