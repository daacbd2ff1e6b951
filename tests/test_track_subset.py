"""Fast-tracking tile subset (tracking.tile_subsample): the subset slot
render must equal the corresponding tiles of the full slot render, and
subset tracking must still converge on the corner scene."""
import numpy as np
import jax.numpy as jnp
import pytest

from isogs_slam_tpu.ops.rasterize import (RasterConfig, image_to_tiles,
                                          render_rgbd_sil_slots,
                                          render_rgbd_sil_slots_subset,
                                          tile_pixel_validity)
from isogs_slam_tpu.utils.transforms import quat_mult

from test_icp import _corner_scene, _pose_err, _slot_table

pytestmark = pytest.mark.smoke


def test_subset_render_matches_full_tiles():
    cam, params, alive = _corner_scene()
    rcfg = RasterConfig(backend="xla", isect_per_gaussian=24.0)
    quat = jnp.asarray([1.0, 0.01, -0.02, 0.005])
    quat = quat / jnp.linalg.norm(quat)
    trans = jnp.asarray([0.02, -0.01, 0.03])
    raw, counts = _slot_table(cam, params, alive, quat, trans, rcfg)

    im, depth, sil, dsq, _ = render_rgbd_sil_slots(raw, counts, quat, trans,
                                                   cam, rcfg)
    full = jnp.concatenate([im, depth, dsq], axis=0)        # [5, H, W]
    full_tiles = image_to_tiles(full, cam)                  # [T, P, 5]
    sil_tiles = image_to_tiles(sil[None], cam)[..., 0]      # [T, P]
    valid = jnp.asarray(tile_pixel_validity(cam))

    sub = 3
    T = cam.num_tiles
    sel = jnp.arange(T // sub, dtype=jnp.int32) * sub
    out, sil_sub = render_rgbd_sil_slots_subset(
        raw[sel], counts[sel], sel, quat, trans, cam, rcfg)

    v = np.asarray(valid[sel])                              # [Ts, P]
    got = np.asarray(out) * v[..., None]
    want = np.asarray(full_tiles[sel]) * v[..., None]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sil_sub) * v,
                               np.asarray(sil_tiles[sel]) * v,
                               rtol=1e-5, atol=1e-5)


def test_subset_tracking_converges():
    from isogs_slam_tpu.slam.losses import LossConfig
    from isogs_slam_tpu.slam.tracking import TrackingConfig, track_frame

    cam, params, alive = _corner_scene()
    rcfg = RasterConfig(backend="xla", isect_per_gaussian=24.0)
    q_gt = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    t_gt = jnp.asarray([0.0, 0.0, 0.0])
    raw_gt, counts_gt = _slot_table(cam, params, alive, q_gt, t_gt, rcfg)
    im_gt, depth_gt, sil, _, _ = render_rgbd_sil_slots(
        raw_gt, counts_gt, q_gt, t_gt, cam, rcfg)
    gt_depth = depth_gt * (sil > 0.5)

    dq = jnp.asarray([1.0, 0.004, -0.006, 0.005])
    q0 = quat_mult(dq / jnp.linalg.norm(dq), q_gt)
    t0 = t_gt + jnp.asarray([0.006, -0.004, 0.006])
    _, tr0 = _pose_err(np.asarray(q0), np.asarray(t0), q_gt, t_gt)

    lcfg = LossConfig(tracking=True, use_sil_for_loss=True, sil_thres=0.9,
                      use_l1=True, ignore_outlier_depth_loss=False,
                      w_im=0.5, w_depth=1.0, calc_iso=False)
    base = TrackingConfig(num_iters=25, lr_quat=2e-3, lr_trans=2e-3,
                          bin_margin_px=8.0)
    res_full = track_frame(params, alive, q0, t0, im_gt, gt_depth,
                           cam, rcfg, lcfg, base)
    # this toy camera has only 20 tiles; sub=2 keeps 10 (at full res
    # sub=4 keeps ~800 — the toy subset is proportionally much harsher)
    res_sub = track_frame(params, alive, q0, t0, im_gt, gt_depth,
                          cam, rcfg, lcfg, base._replace(tile_subsample=2))
    _, tr_full = _pose_err(np.asarray(res_full.quat),
                           np.asarray(res_full.trans), q_gt, t_gt)
    _, tr_sub = _pose_err(np.asarray(res_sub.quat),
                          np.asarray(res_sub.trans), q_gt, t_gt)
    # the strided quarter-subset must still track: strictly better than
    # the initial perturbation and within 3x of the full-image result
    assert tr_sub < tr0 / 2, (tr0, tr_sub)
    assert tr_sub < max(3.0 * tr_full, 0.003), (tr_full, tr_sub)
