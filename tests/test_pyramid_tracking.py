"""Coarse-to-fine tracking (tracking.pyramid_levels).

A pose offset large enough to start outside the full-resolution
photometric basin (several pixels of image motion) is recovered by the
pyramid but not (or much worse) by single-level tracking with the same
full-res iteration budget; pyramid helpers preserve conventions.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from isogs_slam_tpu.core.camera import Camera
from isogs_slam_tpu.core.gaussians import GaussianParams
from isogs_slam_tpu.ops.rasterize import RasterConfig, render_rgbd_sil
from isogs_slam_tpu.slam.losses import LossConfig
from isogs_slam_tpu.slam.tracking import (TrackingConfig, downsample_frame,
                                          pyramid_cam, track_frame,
                                          track_frame_pyramid)
from isogs_slam_tpu.utils.transforms import transform_to_frame

# only the cheap conventions test is in the smoke set; the
# recovery test renders repeatedly (~80 s on CPU)

H, W = 96, 128
FX = 110.0


def _cam():
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1]], np.float64)
    return Camera.from_intrinsics(K, W, H)


def _scene(n=1024, seed=11):
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(-1.3, 1.3, n), rng.uniform(-1.0, 1.0, n),
                    rng.uniform(1.5, 4.0, n)], axis=1)
    params = GaussianParams(
        means3d=jnp.asarray(pts, jnp.float32),
        rgb_colors=jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32),
        unnorm_rotations=jnp.tile(jnp.asarray([1., 0, 0, 0]), (n, 1)),
        logit_opacities=jnp.full((n, 1), 3.0),
        log_scales=jnp.full((n, 3), np.log(0.06), jnp.float32))
    return params, jnp.ones(n, bool)


@pytest.mark.smoke
def test_pyramid_cam_and_downsample_conventions():
    cam = _cam()
    c1 = pyramid_cam(cam, 1)
    assert (c1.width, c1.height) == (W // 2, H // 2)
    assert c1.fx == pytest.approx(cam.fx / 2)
    assert c1.cx == pytest.approx(cam.cx / 2)
    im = jnp.arange(3 * H * W, dtype=jnp.float32).reshape(3, H, W)
    d = jnp.where(jnp.arange(H * W).reshape(1, H, W) % 7 == 0, 0.0, 2.0)
    im1, d1 = downsample_frame(im, d, 1)
    assert im1.shape == (3, H // 2, W // 2)
    assert d1.shape == (1, H // 2, W // 2)
    # color average-pooled; depth nearest (zeros stay exact zeros)
    np.testing.assert_allclose(
        float(im1[0, 0, 0]), float(im[0, :2, :2].mean()), rtol=1e-6)
    assert set(np.unique(np.asarray(d1))) <= {0.0, 2.0}


def test_pyramid_recovers_large_motion():
    cam = _cam()
    params, alive = _scene()
    rcfg = RasterConfig(backend="xla", bwd_mode="scatter")
    q_gt = jnp.asarray([1., 0, 0, 0])
    t_gt = jnp.zeros(3)
    mc, qc = transform_to_frame(params.means3d, params.unnorm_rotations,
                                q_gt, t_gt, False, False)
    gt_im, gt_depth, _, _, _ = render_rgbd_sil(
        mc, qc, params.log_scales, params.logit_opacities,
        params.rgb_colors, alive, cam, rcfg)

    # ~8 px of image motion at fx=110: outside the 2-3 px full-res basin
    t0 = jnp.asarray([0.15, 0.0, 0.0])
    q0 = q_gt
    lcfg = LossConfig(tracking=True, use_sil_for_loss=False, sil_thres=0.5,
                      use_l1=True, ignore_outlier_depth_loss=False,
                      w_im=0.5, w_depth=1.0, calc_iso=False)
    tcfg = TrackingConfig(num_iters=24, lr_quat=0.002, lr_trans=0.01,
                          lr_decay=0.97)

    flat = track_frame(params, alive, q0, t0, gt_im, gt_depth, cam, rcfg,
                       lcfg, tcfg)
    pyr = track_frame_pyramid(params, alive, q0, t0, gt_im, gt_depth, cam,
                              rcfg, lcfg,
                              tcfg._replace(pyramid_levels=3,
                                            pyramid_iters=16))
    err_flat = float(jnp.linalg.norm(flat.trans - t_gt))
    err_pyr = float(jnp.linalg.norm(pyr.trans - t_gt))
    assert err_pyr < 0.05, err_pyr           # recovered most of 0.15 m
    assert err_pyr < err_flat * 0.7, (err_pyr, err_flat)
    assert int(pyr.iters_run) == 24 + 2 * 16
