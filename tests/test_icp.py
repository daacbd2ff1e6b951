"""Point-to-plane ICP GN pose polish (slam/icp.py).

Scene: an axis-aligned corner (back wall + floor + side wall) of opaque
Gaussians — planar structure with three independent normal directions so
all 6 pose DoF are constrained. gt_depth is the map's own render at the
true pose; the polish must pull a perturbed pose back well below the
perturbation, and track_frame(gn_iters>0) must beat the pure-Adam floor.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from isogs_slam_tpu.core.camera import Camera
from isogs_slam_tpu.core.gaussians import GaussianParams
from isogs_slam_tpu.ops.rasterize import (RasterConfig, bin_gaussians,
                                          gather_raw_table,
                                          project_gaussians,
                                          render_rgbd_sil_slots)
from isogs_slam_tpu.slam.icp import (GNConfig, apply_increment,
                                     backproject_grid, gn_depth_polish,
                                     normals_from_points)
from isogs_slam_tpu.utils.transforms import (pose_to_w2c, quat_mult,
                                             transform_to_frame)

# adjudicated-loser knob surface (slam/experimental.py): out of
# the default suite, runnable with `pytest -m experimental` for
# re-adjudication with new evidence (VERDICT r4 item 8)
pytestmark = pytest.mark.experimental

H, W = 64, 80


def _corner_scene(spacing=0.08, scale=0.09):
    """Back wall z=2.6, floor y=0.55, side wall x=0.9 (camera at origin
    looking +z)."""
    rng = np.random.default_rng(7)
    pts = []
    xs = np.arange(-1.7, 1.7, spacing)
    ys = np.arange(-1.4, 1.4, spacing)
    zs = np.arange(0.8, 2.8, spacing)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    pts.append(np.stack([gx.ravel(), gy.ravel(),
                         np.full(gx.size, 2.6)], axis=1))       # back wall
    gx, gz = np.meshgrid(xs, zs, indexing="ij")
    pts.append(np.stack([gx.ravel(), np.full(gx.size, 0.55),
                         gz.ravel()], axis=1))                  # floor
    gy, gz = np.meshgrid(ys, zs, indexing="ij")
    pts.append(np.stack([np.full(gy.size, 0.9), gy.ravel(),
                         gz.ravel()], axis=1))                  # side wall
    pts = np.concatenate(pts).astype(np.float32)
    n = pts.shape[0]
    quats = np.zeros((n, 4), np.float32)
    quats[:, 0] = 1.0
    params = GaussianParams(
        means3d=jnp.asarray(pts),
        rgb_colors=jnp.asarray(rng.uniform(0.2, 0.9, (n, 3)), jnp.float32),
        unnorm_rotations=jnp.asarray(quats),
        logit_opacities=jnp.full((n, 1), 4.0, jnp.float32),
        log_scales=jnp.full((n, 3), np.log(scale), jnp.float32))
    alive = jnp.ones(n, bool)
    K = np.array([[70.0, 0, W / 2], [0, 70.0, H / 2], [0, 0, 1]])
    cam = Camera.from_intrinsics(K, W, H)
    return cam, params, alive


def _slot_table(cam, params, alive, quat, trans, rcfg, margin=8.0):
    mc, qc = transform_to_frame(params.means3d, params.unnorm_rotations,
                                quat, trans, False, False)
    proj = project_gaussians(mc, qc, params.log_scales, alive, cam,
                             margin_px=margin)
    b = bin_gaussians(proj, cam, rcfg)
    return gather_raw_table(params, b.tile_gauss), b.tile_count


def _pose_err(q, t, q_gt, t_gt):
    """(rotation angle rad, translation m) between two w2c poses."""
    Ta = np.asarray(pose_to_w2c(jnp.asarray(q) / jnp.linalg.norm(q),
                                jnp.asarray(t)))
    Tb = np.asarray(pose_to_w2c(jnp.asarray(q_gt), jnp.asarray(t_gt)))
    dR = Ta[:3, :3] @ Tb[:3, :3].T
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    # camera-center error, not w2c-translation difference
    ca = -Ta[:3, :3].T @ Ta[:3, 3]
    cb = -Tb[:3, :3].T @ Tb[:3, 3]
    return ang, np.linalg.norm(ca - cb)


def test_apply_increment_matches_matrix_composition():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=4), jnp.float32)
    q = q / jnp.linalg.norm(q)
    t = jnp.asarray(rng.normal(size=3), jnp.float32)
    delta = jnp.asarray(0.1 * rng.normal(size=6), jnp.float32)
    q2, t2 = apply_increment(q, t, delta)
    T2 = np.asarray(pose_to_w2c(q2 / jnp.linalg.norm(q2), t2))
    # reference: Exp(delta) @ w2c with Rodrigues
    w = np.asarray(delta[:3], np.float64)
    th = np.linalg.norm(w)
    K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    R = (np.eye(3) + np.sin(th) / th * K
         + (1 - np.cos(th)) / th**2 * (K @ K))
    E = np.eye(4)
    E[:3, :3] = R
    E[:3, 3] = np.asarray(delta[3:])
    T_ref = E @ np.asarray(pose_to_w2c(q, t))
    np.testing.assert_allclose(T2, T_ref, atol=1e-5)


def test_plane_normals_exact():
    cam, _, _ = _corner_scene()
    # synthetic depth of the plane z = 2 (camera-aligned): normal (0,0,-1)
    d = jnp.full((H, W), 2.0)
    pts = backproject_grid(d, cam)
    n, ok = normals_from_points(pts, jnp.ones((H, W), bool))
    assert bool(jnp.all(ok[1:-1, 1:-1]))
    inner = np.asarray(n[1:-1, 1:-1])
    np.testing.assert_allclose(inner[..., 2], -1.0, atol=1e-5)


def test_gn_polish_recovers_perturbed_pose():
    cam, params, alive = _corner_scene()
    rcfg = RasterConfig(backend="xla", isect_per_gaussian=24.0)
    q_gt = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    t_gt = jnp.asarray([0.0, 0.0, 0.0])
    raw_gt, counts_gt = _slot_table(cam, params, alive, q_gt, t_gt, rcfg)
    _, depth_gt, sil, _, _ = render_rgbd_sil_slots(
        raw_gt, counts_gt, q_gt, t_gt, cam, rcfg)
    assert float(jnp.mean((sil > 0.9).astype(jnp.float32))) > 0.9
    gt_depth = depth_gt * (sil > 0.5)                  # [1, H, W]

    # ~1.3 cm translation + ~0.8 deg rotation perturbation
    dq = jnp.asarray([1.0, 0.006, -0.009, 0.007])
    q0 = quat_mult(dq / jnp.linalg.norm(dq), q_gt)
    t0 = t_gt + jnp.asarray([0.008, -0.006, 0.009])
    ang0, tr0 = _pose_err(q0, t0, q_gt, t_gt)

    raw, counts = _slot_table(cam, params, alive, q0, t0, rcfg)
    gcfg = GNConfig(iters=6, damping=1e-3)
    q1, t1, c0, c1 = gn_depth_polish(raw, counts, q0, t0, gt_depth,
                                     cam, rcfg, gcfg)
    assert float(c1) < float(c0)
    ang1, tr1 = _pose_err(np.asarray(q1), np.asarray(t1),
                          q_gt, t_gt)
    assert tr1 < tr0 / 5, (tr0, tr1)
    assert ang1 < ang0 / 5, (ang0, ang1)
    assert tr1 < 0.002, tr1            # < 2 mm camera-center error


def test_gn_unbiased_on_semi_transparent_wall():
    """Regression for the 73-cm full-res ATE collapse (NOTES.md session
    5): the composited depth channel is silhouette-scaled (sum w_i z_i,
    sum w_i = sil < 1), so with SENSOR depth as gt the polish aligned the
    true surface to a ~sil-shrunk model surface and dragged the pose
    every frame. With the sil-normalized model depth, a pose that starts
    AT the ground truth must stay there even when sil < 1."""
    rng = np.random.default_rng(5)
    xs = np.arange(-1.7, 1.7, 0.08)
    ys = np.arange(-1.4, 1.4, 0.08)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([gx.ravel(), gy.ravel(),
                    np.full(gx.size, 2.6)], axis=1).astype(np.float32)
    n = pts.shape[0]
    quats = np.zeros((n, 4), np.float32)
    quats[:, 0] = 1.0
    params = GaussianParams(
        means3d=jnp.asarray(pts),
        rgb_colors=jnp.asarray(rng.uniform(0.2, 0.9, (n, 3)), jnp.float32),
        unnorm_rotations=jnp.asarray(quats),
        # semi-transparent: composited sil lands in (0.9, 0.995) so the
        # depth channel is visibly scaled but pixels pass the 0.9 gate
        logit_opacities=jnp.full((n, 1), 0.0, jnp.float32),
        log_scales=jnp.full((n, 3), np.log(0.09), jnp.float32))
    alive = jnp.ones(n, bool)
    K = np.array([[70.0, 0, W / 2], [0, 70.0, H / 2], [0, 0, 1]])
    cam = Camera.from_intrinsics(K, W, H)
    rcfg = RasterConfig(backend="xla", isect_per_gaussian=24.0)

    q_gt = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    t_gt = jnp.asarray([0.0, 0.0, 0.0])
    raw, counts = _slot_table(cam, params, alive, q_gt, t_gt, rcfg)
    _, depth_r, sil, _, _ = render_rgbd_sil_slots(
        raw, counts, q_gt, t_gt, cam, rcfg)
    sil_mean = float(jnp.mean(sil))
    assert 0.9 < sil_mean < 0.995, sil_mean     # scaling is non-trivial
    # raw channel really is sil-scaled (the failure precondition)
    assert float(jnp.mean(depth_r[0])) < 2.6 * 0.995

    gt_depth = jnp.full((1, H, W), 2.6, jnp.float32)   # TRUE sensor depth
    gcfg = GNConfig(iters=4, damping=1e-3)
    q1, t1, _, _ = gn_depth_polish(raw, counts, q_gt, t_gt, gt_depth,
                                   cam, rcfg, gcfg)
    _, tr = _pose_err(np.asarray(q1), np.asarray(t1), q_gt, t_gt)
    # pre-fix this drifted several cm along the wall normal per iteration
    assert tr < 0.003, tr


def test_gn_solve_eigencut_blocks_null_directions():
    """Rank-deficient normal equations (one wall filling the view): the
    damped inverse amplifies Jtr noise in near-null directions by
    ~1/damping; the eigencut solve must step exactly zero there while
    still solving the observable block."""
    from isogs_slam_tpu.slam.icp import gn_solve

    # crafted system: directions 0,1,2 observable (eigenvalues 1e4, after
    # Jacobi scaling ~1), directions 3,4,5 near-null (1e-3 relative)
    lam = np.array([1e4, 8e3, 5e3, 10.0, 6.0, 3.0])
    rng = np.random.default_rng(11)
    Q, _ = np.linalg.qr(rng.normal(size=(6, 6)))
    JtJ = jnp.asarray(Q @ np.diag(lam) @ Q.T, jnp.float32)
    # residual projection: real signal in observable dirs, noise in null
    b = Q @ np.array([50.0, -30.0, 20.0, 0.5, -0.4, 0.3])
    Jtr = jnp.asarray(b, jnp.float32)

    damped = np.asarray(gn_solve(JtJ, Jtr, GNConfig(eig_floor=0.0)))
    cut = np.asarray(gn_solve(JtJ, Jtr, GNConfig(eig_floor=1e-2)))

    # project steps onto the eigenbasis
    d_damp = Q.T @ damped
    d_cut = Q.T @ cut
    # the damped solve walks far along near-null directions...
    assert np.abs(d_damp[3:]).max() > 10 * np.abs(d_damp[:3]).max()
    # ...the eigencut suppresses that walk by >= 10x (not exactly zero:
    # the cut subspace lives in the Jacobi-scaled metric, so a little
    # leakage into this crafted basis remains)
    assert np.abs(d_cut[3:]).max() < np.abs(d_damp[3:]).max() / 10
    # and still solves the observable block like plain GN
    np.testing.assert_allclose(d_cut[:3], -(Q.T @ b)[:3] / lam[:3],
                               rtol=0.05)


def test_gn_polish_flat_wall_noise_does_not_slide():
    """Single wall + noisy sensor depth: in-plane translations and the
    in-plane rotation are unobservable for point-to-plane. The default
    eigencut polish must stay at the ground-truth pose (it cannot fix the
    null directions but must not move along them chasing noise)."""
    rng = np.random.default_rng(9)
    xs = np.arange(-1.7, 1.7, 0.08)
    ys = np.arange(-1.4, 1.4, 0.08)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([gx.ravel(), gy.ravel(),
                    np.full(gx.size, 2.6)], axis=1).astype(np.float32)
    n = pts.shape[0]
    quats = np.zeros((n, 4), np.float32)
    quats[:, 0] = 1.0
    params = GaussianParams(
        means3d=jnp.asarray(pts),
        rgb_colors=jnp.asarray(rng.uniform(0.2, 0.9, (n, 3)), jnp.float32),
        unnorm_rotations=jnp.asarray(quats),
        logit_opacities=jnp.full((n, 1), 4.0, jnp.float32),
        log_scales=jnp.full((n, 3), np.log(0.09), jnp.float32))
    alive = jnp.ones(n, bool)
    K = np.array([[70.0, 0, W / 2], [0, 70.0, H / 2], [0, 0, 1]])
    cam = Camera.from_intrinsics(K, W, H)
    rcfg = RasterConfig(backend="xla", isect_per_gaussian=24.0)

    q_gt = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    t_gt = jnp.asarray([0.0, 0.0, 0.0])
    raw, counts = _slot_table(cam, params, alive, q_gt, t_gt, rcfg)
    # noisy sensor depth of the true wall (2 mm)
    noise = rng.normal(scale=0.002, size=(1, H, W)).astype(np.float32)
    gt_depth = jnp.asarray(np.full((1, H, W), 2.6, np.float32) + noise)

    gcfg = GNConfig(iters=6, damping=1e-3)        # default eig_floor
    q1, t1, _, _ = gn_depth_polish(raw, counts, q_gt, t_gt, gt_depth,
                                   cam, rcfg, gcfg)
    _, tr = _pose_err(np.asarray(q1), np.asarray(t1), q_gt, t_gt)
    assert tr < 0.004, tr


def _wall_scene(rng_seed=5, opacity_logit=4.0):
    rng = np.random.default_rng(rng_seed)
    xs = np.arange(-1.7, 1.7, 0.08)
    ys = np.arange(-1.4, 1.4, 0.08)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([gx.ravel(), gy.ravel(),
                    np.full(gx.size, 2.6)], axis=1).astype(np.float32)
    n = pts.shape[0]
    quats = np.zeros((n, 4), np.float32)
    quats[:, 0] = 1.0
    params = GaussianParams(
        means3d=jnp.asarray(pts),
        rgb_colors=jnp.asarray(rng.uniform(0.1, 0.9, (n, 3)), jnp.float32),
        unnorm_rotations=jnp.asarray(quats),
        logit_opacities=jnp.full((n, 1), opacity_logit, jnp.float32),
        log_scales=jnp.full((n, 3), np.log(0.09), jnp.float32))
    alive = jnp.ones(n, bool)
    K = np.array([[70.0, 0, W / 2], [0, 70.0, H / 2], [0, 0, 1]])
    cam = Camera.from_intrinsics(K, W, H)
    return cam, params, alive


def test_gn_combined_photometric_recovers_inplane_offset():
    """Single textured wall + in-plane translation offset: point-to-plane
    rows carry NO in-plane information (the eigencut correctly refuses to
    move there), so depth-only GN must leave the in-plane error; the
    combined photometric block (colored ICP) observes the wall texture
    and must recover it."""
    cam, params, alive = _wall_scene()
    rcfg = RasterConfig(backend="xla", isect_per_gaussian=24.0)
    q_gt = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    t_gt = jnp.asarray([0.0, 0.0, 0.0])
    raw_gt, counts_gt = _slot_table(cam, params, alive, q_gt, t_gt, rcfg)
    im_r, depth_r, sil, _, _ = render_rgbd_sil_slots(
        raw_gt, counts_gt, q_gt, t_gt, cam, rcfg)
    s = jnp.maximum(sil, 1e-6)
    gt_im = im_r / s[None]                 # sensor-style (unscaled) color
    gt_depth = (depth_r / s[None]) * (sil > 0.5)

    # mostly-in-plane offset: ~3.2 cm in the wall plane + 5 mm in depth
    t0 = t_gt + jnp.asarray([0.03, -0.012, 0.005])
    q0 = q_gt
    _, tr0 = _pose_err(q0, t0, q_gt, t_gt)

    raw, counts = _slot_table(cam, params, alive, q0, t0, rcfg)
    depth_only = GNConfig(iters=8, damping=1e-3, phot_weight=0.0)
    q1, t1, _, _ = gn_depth_polish(raw, counts, q0, t0, gt_depth,
                                   cam, rcfg, depth_only, gt_im=gt_im)
    _, tr_d = _pose_err(np.asarray(q1), np.asarray(t1), q_gt, t_gt)
    # depth-only cannot see the in-plane component: most of the error stays
    assert tr_d > 0.015, tr_d

    combined = GNConfig(iters=8, damping=1e-3)   # default phot_weight
    q2, t2, c0, c1 = gn_depth_polish(raw, counts, q0, t0, gt_depth,
                                     cam, rcfg, combined, gt_im=gt_im)
    _, tr_c = _pose_err(np.asarray(q2), np.asarray(t2), q_gt, t_gt)
    assert tr_c < tr0 / 5, (tr0, tr_c)
    assert tr_c < 0.006, tr_c


def test_track_frame_gn_beats_adam_floor():
    from isogs_slam_tpu.slam.losses import LossConfig
    from isogs_slam_tpu.slam.tracking import TrackingConfig, track_frame

    cam, params, alive = _corner_scene()
    rcfg = RasterConfig(backend="xla", isect_per_gaussian=24.0)
    q_gt = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    t_gt = jnp.asarray([0.0, 0.0, 0.0])
    raw_gt, counts_gt = _slot_table(cam, params, alive, q_gt, t_gt, rcfg)
    im_r, depth_gt, sil, _, _ = render_rgbd_sil_slots(
        raw_gt, counts_gt, q_gt, t_gt, cam, rcfg)
    # sensor-style gt: the raw composited channels are silhouette-scaled
    # (sum w_i = sil < 1); a real sensor sees the surface itself. The
    # combined GN compares against sil-normalized model channels, so a
    # raw-channel gt would carry a (1 - sil) bias into the photometric
    # residuals.
    s = jnp.maximum(sil, 1e-6)
    im_gt = im_r / s[None]
    gt_depth = (depth_gt / s[None]) * (sil > 0.5)

    dq = jnp.asarray([1.0, 0.004, -0.006, 0.005])
    q0 = quat_mult(dq / jnp.linalg.norm(dq), q_gt)
    t0 = t_gt + jnp.asarray([0.006, -0.004, 0.006])

    lcfg = LossConfig(tracking=True, use_sil_for_loss=True, sil_thres=0.9,
                      use_l1=True, ignore_outlier_depth_loss=False,
                      w_im=0.5, w_depth=1.0, calc_iso=False)
    base = TrackingConfig(num_iters=12, lr_quat=2e-3, lr_trans=2e-3,
                          bin_margin_px=8.0)
    res_adam = track_frame(params, alive, q0, t0, im_gt, gt_depth,
                           cam, rcfg, lcfg, base)
    res_gn = track_frame(params, alive, q0, t0, im_gt, gt_depth,
                         cam, rcfg, lcfg, base._replace(gn_iters=4))
    _, tr_adam = _pose_err(np.asarray(res_adam.quat),
                           np.asarray(res_adam.trans), q_gt, t_gt)
    _, tr_gn = _pose_err(np.asarray(res_gn.quat),
                         np.asarray(res_gn.trans), q_gt, t_gt)
    assert tr_gn < tr_adam / 2, (tr_adam, tr_gn)
    assert tr_gn < 0.002, tr_gn
