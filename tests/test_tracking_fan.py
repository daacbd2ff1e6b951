"""Pose-perturbation fan (tracking.fan_rounds) + per-level pyramid lr
scale (tracking.pyramid_lr_scale): the Adam-side sub-lr refinements.

The fan is a forward-only pattern search around the Adam best pose using
the same mask-normalized candidate metric, so by construction it can only
improve that metric; these tests pin that and that it tightens pose
recovery below the Adam bounce floor on a self-consistent scene (GT
rendered from the map itself, so the metric's minimum IS the true pose).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from isogs_slam_tpu.core.camera import Camera
from isogs_slam_tpu.core.gaussians import GaussianParams
from isogs_slam_tpu.ops.rasterize import RasterConfig, render_rgbd_sil
from isogs_slam_tpu.slam.losses import LossConfig
from isogs_slam_tpu.slam.tracking import (TrackingConfig, track_frame,
                                          track_frame_pyramid)
from isogs_slam_tpu.utils.transforms import transform_to_frame

# adjudicated-loser knob surface (slam/experimental.py): out of
# the default suite, runnable with `pytest -m experimental` for
# re-adjudication with new evidence (VERDICT r4 item 8)
pytestmark = pytest.mark.experimental

H, W = 64, 80


def _scene(n=500, seed=2):
    rng = np.random.default_rng(seed)
    K = np.array([[70.0, 0, W / 2], [0, 70.0, H / 2], [0, 0, 1]])
    cam = Camera.from_intrinsics(K, W, H)
    pts = np.stack([rng.uniform(-1.0, 1.0, n), rng.uniform(-0.7, 0.7, n),
                    rng.uniform(1.3, 3.2, n)], axis=1)
    params = GaussianParams(
        means3d=jnp.asarray(pts, jnp.float32),
        rgb_colors=jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32),
        unnorm_rotations=jnp.tile(jnp.asarray([1., 0, 0, 0]), (n, 1)),
        logit_opacities=jnp.full((n, 1), 2.5),
        log_scales=jnp.full((n, 3), np.log(0.06), jnp.float32))
    return cam, params, jnp.ones(n, bool)


def _gt_at(cam, params, alive, rcfg, quat, trans):
    mc, qc = transform_to_frame(params.means3d, params.unnorm_rotations,
                                quat, trans, False, False)
    im, depth, _, _, _ = render_rgbd_sil(
        mc, qc, params.log_scales, params.logit_opacities,
        params.rgb_colors, alive, cam, rcfg)
    return im, depth


def _lcfg():
    return LossConfig(tracking=True, use_sil_for_loss=True, sil_thres=0.5,
                      use_l1=True, ignore_outlier_depth_loss=False,
                      w_im=0.5, w_depth=1.0, calc_iso=False)


def _base_tcfg():
    return TrackingConfig(num_iters=24, lr_quat=0.002, lr_trans=0.004)


def _pose_err(res, q_true, t_true):
    q = np.asarray(res.quat)
    q = q / np.linalg.norm(q)
    return (float(np.linalg.norm(np.asarray(res.trans) - t_true)),
            float(np.linalg.norm(q - q_true)))


def test_fan_tightens_pose_below_adam_floor():
    cam, params, alive = _scene()
    # generous isect capacity: margin-8 tracking binnings carry ~2x the
    # margin-0 demand on this dense toy scene, and overflow drops TRUE
    # candidates (the pipeline's adaptive cap handles this in real runs)
    rcfg = RasterConfig(backend="xla", isect_per_gaussian=16.0)
    q_true = np.array([1.0, 0, 0, 0], np.float32)
    t_true = np.zeros(3, np.float32)
    gt_im, gt_depth = _gt_at(cam, params, alive, rcfg,
                             jnp.asarray(q_true), jnp.asarray(t_true))
    # init offset ~ 2x the translation lr: Adam reaches the bounce floor
    init_q = jnp.asarray([1.0, 0.001, -0.001, 0.0])
    init_t = jnp.asarray([0.008, -0.006, 0.004])

    base = _base_tcfg()
    res0 = track_frame(params, alive, init_q, init_t, gt_im, gt_depth,
                       cam, rcfg, _lcfg(), base)
    res1 = track_frame(params, alive, init_q, init_t, gt_im, gt_depth,
                       cam, rcfg, _lcfg(), base._replace(fan_rounds=3))
    e0t, e0q = _pose_err(res0, q_true, t_true)
    e1t, e1q = _pose_err(res1, q_true, t_true)
    assert np.isfinite([e0t, e0q, e1t, e1q]).all()
    # the fan keeps the loop's candidate on rejection: never worse than
    # a tiny numerical epsilon, and on this self-consistent scene it
    # should measurably tighten the translation
    assert e1t <= e0t + 1e-6, (e1t, e0t)
    assert e1q <= e0q + 1e-5, (e1q, e0q)
    assert e1t < 0.9 * e0t or e0t < 5e-4, (e1t, e0t)


def test_polyak_tail_tightens_pose_on_self_consistent_scene():
    """tracking.polyak_rho: the EMA of the Adam iterates averages away
    the L1 bounce. On a self-consistent scene (GT rendered from the map
    at the true pose) the bounce is centered on truth, so the EMA pose
    must land at least as close as the best-candidate iterate — and
    measurably closer when the candidate sits at the bounce floor."""
    cam, params, alive = _scene()
    rcfg = RasterConfig(backend="xla", isect_per_gaussian=16.0)
    q_true = np.array([1.0, 0, 0, 0], np.float32)
    t_true = np.zeros(3, np.float32)
    gt_im, gt_depth = _gt_at(cam, params, alive, rcfg,
                             jnp.asarray(q_true), jnp.asarray(t_true))
    init_q = jnp.asarray([1.0, 0.001, -0.001, 0.0])
    init_t = jnp.asarray([0.008, -0.006, 0.004])

    # longer loop than the fan test: the EMA tail needs the trajectory to
    # REACH the bounce regime before averaging pays
    base = _base_tcfg()._replace(num_iters=48)
    res0 = track_frame(params, alive, init_q, init_t, gt_im, gt_depth,
                       cam, rcfg, _lcfg(), base)
    res1 = track_frame(params, alive, init_q, init_t, gt_im, gt_depth,
                       cam, rcfg, _lcfg(), base._replace(polyak_rho=0.9))
    e0t, e0q = _pose_err(res0, q_true, t_true)
    e1t, e1q = _pose_err(res1, q_true, t_true)
    assert np.isfinite([e0t, e0q, e1t, e1q]).all()
    # averaging a bounce centered on truth: generous slack for the bias-
    # transient, but the translation should not be meaningfully worse
    assert e1t <= 1.25 * e0t + 1e-5, (e1t, e0t)
    # and the loop itself is untouched at rho=0 (same program as res0)
    res2 = track_frame(params, alive, init_q, init_t, gt_im, gt_depth,
                       cam, rcfg, _lcfg(), base._replace(polyak_rho=0.0))
    np.testing.assert_array_equal(np.asarray(res0.quat),
                                  np.asarray(res2.quat))


def test_fan_with_tile_subsample_runs_and_does_not_regress():
    cam, params, alive = _scene()
    # generous isect capacity: margin-8 tracking binnings carry ~2x the
    # margin-0 demand on this dense toy scene, and overflow drops TRUE
    # candidates (the pipeline's adaptive cap handles this in real runs)
    rcfg = RasterConfig(backend="xla", isect_per_gaussian=16.0)
    q_true = np.array([1.0, 0, 0, 0], np.float32)
    t_true = np.zeros(3, np.float32)
    gt_im, gt_depth = _gt_at(cam, params, alive, rcfg,
                             jnp.asarray(q_true), jnp.asarray(t_true))
    init_q = jnp.asarray([1.0, 0.0, 0.001, 0.0])
    init_t = jnp.asarray([0.006, 0.004, -0.003])
    base = _base_tcfg()._replace(tile_subsample=2)
    res0 = track_frame(params, alive, init_q, init_t, gt_im, gt_depth,
                       cam, rcfg, _lcfg(), base)
    res1 = track_frame(params, alive, init_q, init_t, gt_im, gt_depth,
                       cam, rcfg, _lcfg(), base._replace(fan_rounds=2))
    e0t, _ = _pose_err(res0, q_true, t_true)
    e1t, _ = _pose_err(res1, q_true, t_true)
    assert np.isfinite([e0t, e1t]).all()
    assert e1t <= e0t + 1e-6


def test_pyramid_lr_scale_converges():
    cam, params, alive = _scene()
    # generous isect capacity: margin-8 tracking binnings carry ~2x the
    # margin-0 demand on this dense toy scene, and overflow drops TRUE
    # candidates (the pipeline's adaptive cap handles this in real runs)
    rcfg = RasterConfig(backend="xla", isect_per_gaussian=16.0)
    q_true = np.array([1.0, 0, 0, 0], np.float32)
    t_true = np.zeros(3, np.float32)
    gt_im, gt_depth = _gt_at(cam, params, alive, rcfg,
                             jnp.asarray(q_true), jnp.asarray(t_true))
    init_q = jnp.asarray([1.0, 0.002, 0.0, -0.001])
    init_t = jnp.asarray([0.01, -0.008, 0.005])
    tcfg = _base_tcfg()._replace(pyramid_levels=2, pyramid_iters=16,
                                 pyramid_lr_scale=2.0, fan_rounds=2)
    res = track_frame_pyramid(params, alive, init_q, init_t, gt_im,
                              gt_depth, cam, rcfg, _lcfg(), tcfg)
    et, eq = _pose_err(res, q_true, t_true)
    assert np.isfinite([et, eq]).all()
    assert et < 0.01 and eq < 0.01, (et, eq)
    # the pyramid log concatenates coarse + full-res iterations
    assert int(res.iters_run) >= 16 + 24
