"""Slot-table tracking render (ops/rasterize.render_rgbd_sil_slots).

During tracking the Gaussian params are frozen, so the raw per-(tile, slot)
records are gathered once and each iteration re-projects per slot with the
pose as the only gradient leaf. These tests pin that the slot path produces
the same images, loss, and pose gradients as the per-gaussian path on the
same tile lists.
"""
import numpy as np
import jax
import jax.numpy as jnp

from isogs_slam_tpu.core.camera import Camera
from isogs_slam_tpu.core.gaussians import GaussianParams
from isogs_slam_tpu.ops.rasterize import (RasterConfig, bin_gaussians,
                                          gather_raw_table, project_gaussians,
                                          render_rgbd_sil,
                                          render_rgbd_sil_slots)
from isogs_slam_tpu.slam.losses import LossConfig, compute_loss, \
    compute_loss_slots
from isogs_slam_tpu.utils.transforms import transform_to_frame
import pytest

pytestmark = pytest.mark.smoke  # sub-5-min CI subset

H, W = 48, 64


def _setup(seed=0, n=300):
    rng = np.random.default_rng(seed)
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])
    cam = Camera.from_intrinsics(K, W, H)
    pts = np.stack([rng.uniform(-0.8, 0.8, n), rng.uniform(-0.6, 0.6, n),
                    rng.uniform(1.2, 3.0, n)], axis=1)
    # include hostile rows: a dead all-zero row and one behind the camera
    pts[0] = 0.0
    pts[1] = [0.0, 0.0, -1.0]
    params = GaussianParams(
        means3d=jnp.asarray(pts, jnp.float32),
        rgb_colors=jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32),
        unnorm_rotations=jnp.asarray(
            rng.normal(size=(n, 4)) + np.array([2.0, 0, 0, 0]), jnp.float32),
        logit_opacities=jnp.asarray(rng.normal(1.0, 0.5, (n, 1)),
                                    jnp.float32),
        log_scales=jnp.full((n, 3), np.log(0.05), jnp.float32))
    alive = jnp.ones(n, bool).at[0].set(False)
    gt_im = jnp.asarray(rng.uniform(0, 1, (3, H, W)), jnp.float32)
    gt_d = jnp.asarray(rng.uniform(1.0, 3.0, (1, H, W)), jnp.float32)
    return cam, params, alive, gt_im, gt_d


def _bin(cam, params, alive, quat, trans, rcfg, margin=0.0):
    # margin 0 for the identity comparisons: the slot path's per-slot
    # coverage test silences margin-only candidates (reference truncation
    # semantics), so a margin-widened binning renders like the MARGIN-0
    # per-gaussian render, not like the per-gaussian render on the same
    # widened lists — see test_margin_slot_render_is_output_preserving
    mc, qc = transform_to_frame(params.means3d, params.unnorm_rotations,
                                quat, trans, False, False)
    proj = project_gaussians(mc, qc, params.log_scales, alive, cam,
                             margin_px=margin)
    return bin_gaussians(proj, cam, rcfg)


def test_slot_render_matches_gaussian_render():
    cam, params, alive, _, _ = _setup()
    rcfg = RasterConfig(backend="xla", grad_scatter_bf16=False)
    quat = jnp.asarray([1.0, 0.0, 0.03, 0.0])
    trans = jnp.asarray([0.02, -0.01, 0.0])
    binning = _bin(cam, params, alive, quat, trans, rcfg)

    mc, qc = transform_to_frame(params.means3d, params.unnorm_rotations,
                                quat, trans, False, False)
    im_g, d_g, sil_g, dsq_g, _ = render_rgbd_sil(
        mc, qc, params.log_scales, params.logit_opacities,
        params.rgb_colors, alive, cam, rcfg, binning=binning)

    raw = gather_raw_table(params, binning.tile_gauss)
    im_s, d_s, sil_s, dsq_s, _ = render_rgbd_sil_slots(
        raw, binning.tile_count, quat, trans, cam, rcfg)

    np.testing.assert_allclose(np.asarray(im_s), np.asarray(im_g),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_g),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sil_s), np.asarray(sil_g),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dsq_s), np.asarray(dsq_g),
                               rtol=1e-5, atol=1e-4)


def test_slot_loss_and_pose_grads_match():
    cam, params, alive, gt_im, gt_d = _setup(seed=3)
    rcfg = RasterConfig(backend="xla", grad_scatter_bf16=False)
    lcfg = LossConfig(tracking=True, use_sil_for_loss=True, sil_thres=0.5,
                      use_l1=True, ignore_outlier_depth_loss=False,
                      w_im=0.5, w_depth=1.0, calc_iso=False)
    q0 = jnp.asarray([1.0, 0.0, 0.02, 0.0])
    t0 = jnp.asarray([0.01, 0.0, 0.0])
    binning = _bin(cam, params, alive, q0, t0, rcfg)
    raw = gather_raw_table(params, binning.tile_gauss)
    p_sg = jax.tree.map(jax.lax.stop_gradient, params)

    def loss_gauss(pose):
        return compute_loss(p_sg, alive, pose[0], pose[1], gt_im, gt_d,
                            cam, rcfg, lcfg, binning=binning).loss

    def loss_slots(pose):
        return compute_loss_slots(raw, binning.tile_count, pose[0], pose[1],
                                  gt_im, gt_d, cam, rcfg, lcfg).loss

    pose = (q0, t0)
    lg, gg = jax.value_and_grad(loss_gauss)(pose)
    ls, gs = jax.value_and_grad(loss_slots)(pose)
    np.testing.assert_allclose(float(ls), float(lg), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gg), jax.tree.leaves(gs)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(b)), b
        np.testing.assert_allclose(b, a, rtol=2e-4,
                                   atol=2e-4 * max(np.abs(a).max(), 1e-8))


def test_margin_slot_render_is_output_preserving():
    """The frozen-binning slot render with a pixel MARGIN must equal the
    margin-0 per-gaussian render (reference truncation semantics) at the
    binning pose AND at drifted poses inside the margin — the per-slot
    coverage test in _slot_gdata silences margin-only candidates, whose
    compositing alpha (up to op*e^{-4.5}) used to shift the tracking loss
    minimum away from the mapping-consistent pose."""
    cam, params, alive, _, _ = _setup(n=500)
    # a margin-8 binning carries ~2x the margin-0 isect demand on this
    # dense toy scene; give it headroom (overflow drops TRUE candidates
    # in arbitrary order — the real pipeline's adaptive cap grows on
    # demand, raster.adaptive_isect_cap)
    rcfg = RasterConfig(backend="xla", grad_scatter_bf16=False,
                        isect_per_gaussian=12.0)
    q0 = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    t0 = jnp.zeros(3)

    mc, qc = transform_to_frame(params.means3d, params.unnorm_rotations,
                                q0, t0, False, False)
    proj_m = project_gaussians(mc, qc, params.log_scales, alive, cam,
                               margin_px=8.0)
    import jax as _jax
    bin_m = bin_gaussians(
        proj_m, cam, rcfg,
        opacity=_jax.nn.sigmoid(params.logit_opacities[:, 0]),
        cull_slack_px=8.0)
    assert int(bin_m.n_overflow) == 0
    raw = gather_raw_table(params, bin_m.tile_gauss)

    # drifted poses within the margin budget (~0.5 px at this scale each);
    # at the binning pose the renders must be BIT-EXACT; at drifted poses
    # the only residual is the frozen within-tile depth-sort order of
    # near-equal-z pairs (the reference re-sorts every iteration)
    poses = [((q0, t0), 0.0),
             ((jnp.asarray([1.0, 0.002, -0.001, 0.0]),
               jnp.asarray([0.008, -0.006, 0.004])), 8e-3),
             ((jnp.asarray([1.0, -0.001, 0.002, 0.001]),
               jnp.asarray([-0.01, 0.005, -0.008])), 8e-3)]
    for (q, t), atol in poses:
        mc_p, qc_p = transform_to_frame(params.means3d,
                                        params.unnorm_rotations, q, t,
                                        False, False)
        im_ref, d_ref, sil_ref, _, _ = render_rgbd_sil(
            mc_p, qc_p, params.log_scales, params.logit_opacities,
            params.rgb_colors, alive, cam, rcfg)   # fresh margin-0 bins
        im_s, d_s, sil_s, _, _ = render_rgbd_sil_slots(
            raw, bin_m.tile_count, q, t, cam, rcfg)
        np.testing.assert_allclose(np.asarray(im_s), np.asarray(im_ref),
                                   atol=atol)
        np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_ref),
                                   atol=max(atol, 2e-3) if atol else 0.0)
        np.testing.assert_allclose(np.asarray(sil_s), np.asarray(sil_ref),
                                   atol=atol)
