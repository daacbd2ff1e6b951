"""Cross-frame tracking binning reuse (slam/tracking.py BinningReuse).

The map only changes on map_every frames; the tracking loop reuses one
margin-widened binning across the frames in between and rebins when the
predicted pose drifts beyond the margin budget. These tests pin:
  * externally-passed binning == the binning track_frame builds internally
  * max_pixel_drift is 0 for identical poses and ~fx*dtheta for a small yaw
  * BinningReuse reuses under small drift, rebins after invalidate()/large
    drift, and the reused-binning tracking result matches a fresh binning
"""
import numpy as np
import jax
import jax.numpy as jnp

from isogs_slam_tpu.core.camera import Camera
from isogs_slam_tpu.core.gaussians import GaussianParams
from isogs_slam_tpu.ops.rasterize import RasterConfig
from isogs_slam_tpu.slam.losses import LossConfig
from isogs_slam_tpu.slam.tracking import (BinningReuse, TrackingConfig,
                                          bin_at_pose, max_pixel_drift,
                                          track_frame)

H, W = 64, 80
FX = 70.0


def _cam():
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1]], np.float64)
    return Camera.from_intrinsics(K, W, H)


def _scene(n=512, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(-1.2, 1.2, n), rng.uniform(-1.0, 1.0, n),
                    rng.uniform(1.5, 3.5, n)], axis=1)
    params = GaussianParams(
        means3d=jnp.asarray(pts, jnp.float32),
        rgb_colors=jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32),
        unnorm_rotations=jnp.tile(jnp.asarray([1., 0, 0, 0]), (n, 1)),
        logit_opacities=jnp.full((n, 1), 2.0),
        log_scales=jnp.full((n, 3), np.log(0.04), jnp.float32))
    alive = jnp.ones(n, bool)
    return params, alive


def _gt(cam, params, alive):
    from isogs_slam_tpu.ops.rasterize import render_rgbd_sil
    from isogs_slam_tpu.utils.transforms import transform_to_frame
    q = jnp.asarray([1., 0, 0, 0])
    t = jnp.zeros(3)
    mc, qc = transform_to_frame(params.means3d, params.unnorm_rotations,
                                q, t, False, False)
    im, depth, _, _, _ = render_rgbd_sil(
        mc, qc, params.log_scales, params.logit_opacities,
        params.rgb_colors, alive, cam, RasterConfig(backend="xla"))
    return im, depth


def test_external_binning_matches_internal():
    cam = _cam()
    params, alive = _scene()
    gt_im, gt_depth = _gt(cam, params, alive)
    rcfg = RasterConfig(backend="xla")
    lcfg = LossConfig(tracking=True, use_sil_for_loss=True, sil_thres=0.5,
                      use_l1=True, ignore_outlier_depth_loss=False,
                      w_im=0.5, w_depth=1.0, calc_iso=False)
    tcfg = TrackingConfig(num_iters=4, lr_quat=0.001, lr_trans=0.004,
                          bin_margin_px=8.0)
    q0 = jnp.asarray([1.0, 0.0, 0.01, 0.0])
    t0 = jnp.asarray([0.01, 0.0, 0.0])
    res_int = track_frame(params, alive, q0, t0, gt_im, gt_depth,
                          cam, rcfg, lcfg, tcfg)
    binning = bin_at_pose(params, alive, q0, t0, jnp.float32(8.0),
                          cam, rcfg)
    res_ext = track_frame(params, alive, q0, t0, gt_im, gt_depth,
                          cam, rcfg, lcfg, tcfg, binning=binning)
    np.testing.assert_allclose(np.asarray(res_int.quat),
                               np.asarray(res_ext.quat), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(res_int.trans),
                               np.asarray(res_ext.trans), rtol=0, atol=0)


def test_max_pixel_drift():
    cam = _cam()
    params, alive = _scene()
    q = jnp.asarray([1., 0, 0, 0])
    t = jnp.zeros(3)
    d0 = float(max_pixel_drift(params.means3d, alive, q, t, q, t, cam,
                               stride=1))
    assert d0 == 0.0
    # small yaw: drift ~ fx * theta (theta = 2*qy for small quats)
    theta = 0.02
    q1 = jnp.asarray([np.cos(theta / 2), 0.0, np.sin(theta / 2), 0.0],
                     dtype=jnp.float32)
    d1 = float(max_pixel_drift(params.means3d, alive, q, t, q1, t, cam,
                               stride=1))
    assert FX * theta * 0.5 < d1 < FX * theta * 3.0, d1


def test_binning_reuse_policy_and_equivalence():
    cam = _cam()
    params, alive = _scene()
    gt_im, gt_depth = _gt(cam, params, alive)
    rcfg = RasterConfig(backend="xla")
    lcfg = LossConfig(tracking=True, use_sil_for_loss=True, sil_thres=0.5,
                      use_l1=True, ignore_outlier_depth_loss=False,
                      w_im=0.5, w_depth=1.0, calc_iso=False)
    tcfg = TrackingConfig(num_iters=6, lr_quat=0.001, lr_trans=0.004)
    cache = BinningReuse(cam, rcfg, margin_px=16.0, slack_px=8.0)

    q0 = jnp.asarray([1., 0, 0, 0])
    t0 = jnp.zeros(3)
    b0 = cache.get(params, alive, q0, t0)
    assert cache.n_rebins == 1
    # tiny pose step (well under 8px at fx=70) -> reuse
    t1 = jnp.asarray([0.004, 0.0, 0.0])
    b1 = cache.get(params, alive, q0, t1)
    assert cache.n_reuses == 1 and b1 is b0
    # large yaw (~0.5 rad -> hundreds of px) -> rebin
    q2 = jnp.asarray([np.cos(0.25), 0.0, np.sin(0.25), 0.0],
                     dtype=jnp.float32)
    cache.get(params, alive, q2, t0)
    assert cache.n_rebins == 2
    # invalidate -> rebin even at the same pose
    cache.invalidate()
    cache.get(params, alive, q2, t0)
    assert cache.n_rebins == 3

    # quality: tracking with the frame-0 binning reused at a slightly moved
    # init pose lands (close to) the same pose as a fresh binning
    res_fresh = track_frame(params, alive, q0, t1, gt_im, gt_depth,
                            cam, rcfg, lcfg, tcfg,
                            binning=bin_at_pose(params, alive, q0, t1,
                                                jnp.float32(16.0), cam,
                                                rcfg))
    res_reused = track_frame(params, alive, q0, t1, gt_im, gt_depth,
                             cam, rcfg, lcfg, tcfg, binning=b0)
    assert np.linalg.norm(np.asarray(res_fresh.trans)
                          - np.asarray(res_reused.trans)) < 5e-3
    assert np.linalg.norm(np.asarray(res_fresh.quat)
                          - np.asarray(res_reused.quat)) < 5e-3
