"""Tile-sharded tracking (parallel/track_sharded.py) matches the serial
frozen-slot-table tracking loop on the virtual 8-device mesh: identical
binning, per-iteration psum'd loss pieces + pose gradients, same Adam
trajectory up to float reassociation of the pixel sums."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from isogs_slam_tpu.core.camera import Camera
from isogs_slam_tpu.core.gaussians import GaussianParams
from isogs_slam_tpu.ops.rasterize import RasterConfig
from isogs_slam_tpu.slam.losses import LossConfig
from isogs_slam_tpu.slam.tracking import TrackingConfig, track_frame
from isogs_slam_tpu.parallel.track_sharded import (
    make_tile_mesh, make_tracking_frame_sharded)

pytestmark = pytest.mark.smoke

H, W = 48, 64


def _scene(seed=0, n=400):
    rng = np.random.default_rng(seed)
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])
    cam = Camera.from_intrinsics(K, W, H)
    pts = np.stack([rng.uniform(-0.8, 0.8, n), rng.uniform(-0.6, 0.6, n),
                    rng.uniform(1.2, 3.0, n)], axis=1)
    params = GaussianParams(
        means3d=jnp.asarray(pts, jnp.float32),
        rgb_colors=jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32),
        unnorm_rotations=jnp.asarray(
            rng.normal(size=(n, 4)) + np.array([2.0, 0, 0, 0]),
            jnp.float32),
        logit_opacities=jnp.asarray(rng.normal(2.0, 0.5, (n, 1)),
                                    jnp.float32),
        log_scales=jnp.full((n, 3), np.log(0.06), jnp.float32))
    alive = jnp.ones(n, bool).at[-20:].set(False)
    return cam, params, alive


def _gt_from_pose(cam, params, alive, quat, trans, rcfg):
    from isogs_slam_tpu.ops.rasterize import render_rgbd_sil
    from isogs_slam_tpu.utils.transforms import transform_to_frame
    mc, qc = transform_to_frame(params.means3d, params.unnorm_rotations,
                                quat, trans, False, False)
    im, d, _, _, _ = render_rgbd_sil(
        mc, qc, params.log_scales, params.logit_opacities,
        params.rgb_colors, alive, cam, rcfg)
    return jax.lax.stop_gradient(im), jax.lax.stop_gradient(d)


def test_tile_sharded_tracking_matches_serial():
    assert jax.device_count() >= 8
    cam, params, alive = _scene()
    rcfg = RasterConfig(backend="xla", grad_scatter_bf16=False,
                        isect_per_gaussian=12.0)
    lcfg = LossConfig(tracking=True, use_sil_for_loss=True, sil_thres=0.5,
                      use_l1=True, ignore_outlier_depth_loss=False,
                      w_im=0.5, w_depth=1.0, calc_iso=False)
    tcfg = TrackingConfig(num_iters=8, lr_quat=0.002, lr_trans=0.01,
                          lr_decay=0.95)

    q_true = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    t_true = jnp.zeros(3)
    gt_im, gt_d = _gt_from_pose(cam, params, alive, q_true, t_true, rcfg)
    q0 = jnp.asarray([1.0, 0.004, -0.003, 0.002])
    t0 = jnp.asarray([0.02, -0.015, 0.01])

    res_serial = track_frame(params, alive, q0, t0, gt_im, gt_d, cam,
                             rcfg, lcfg, tcfg)
    mesh = make_tile_mesh(8)
    fn = make_tracking_frame_sharded(mesh, cam, rcfg, lcfg, tcfg)
    res_sharded = fn(params, alive, q0, t0, gt_im, gt_d)

    assert int(res_sharded.iters_run) == int(res_serial.iters_run)
    # same trajectory up to reassociation of the pixel sums
    np.testing.assert_allclose(np.asarray(res_sharded.quat),
                               np.asarray(res_serial.quat), atol=5e-4)
    np.testing.assert_allclose(np.asarray(res_sharded.trans),
                               np.asarray(res_serial.trans), atol=5e-4)
    ls, lh = np.asarray(res_serial.loss_log), np.asarray(
        res_sharded.loss_log)
    m = np.isfinite(ls[:, 0])
    np.testing.assert_allclose(lh[m, 0], ls[m, 0], rtol=1e-3)
    # both recover most of the pose error
    err0 = float(jnp.linalg.norm(t0 - t_true))
    err1 = float(jnp.linalg.norm(res_sharded.trans - t_true))
    assert err1 < 0.5 * err0


def test_tile_sharded_tracking_rejects_unsupported_modes():
    cam, params, alive = _scene()
    rcfg = RasterConfig(backend="xla")
    lcfg = LossConfig(tracking=True, use_sil_for_loss=True, sil_thres=0.5,
                      use_l1=True, ignore_outlier_depth_loss=False,
                      w_im=0.5, w_depth=1.0, calc_iso=False)
    mesh = make_tile_mesh(8)
    with pytest.raises(NotImplementedError):
        make_tracking_frame_sharded(
            mesh, cam, rcfg, lcfg, TrackingConfig(
                num_iters=2, lr_quat=1e-3, lr_trans=1e-3, gn_iters=2))
    with pytest.raises(NotImplementedError):
        make_tracking_frame_sharded(
            mesh, cam, rcfg, lcfg._replace(ignore_outlier_depth_loss=True),
            TrackingConfig(num_iters=2, lr_quat=1e-3, lr_trans=1e-3))
