"""Multi-chip sharded mapping step (8 virtual devices) and checkpoint
auto-resume."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from isogs_slam_tpu.core import optim
from isogs_slam_tpu.core.camera import Camera
from isogs_slam_tpu.core.gaussians import (append_rows, empty_state,
                                           new_gaussian_rows)
from isogs_slam_tpu.ops.rasterize import RasterConfig
from isogs_slam_tpu.parallel.sharded import (batched_map_loss, make_mesh,
                                             make_sharded_map_step,
                                             replicate, shard_view_batch)
from isogs_slam_tpu.slam.losses import LossConfig
from isogs_slam_tpu.slam.mapping import MappingConfig, PruneConfig


def _setup(n=1200, B=8):
    rng = np.random.default_rng(0)
    st = empty_state(2048)
    pts = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32)
                      + np.array([0, 0, 2.5], np.float32))
    cols = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    st = append_rows(st, new_gaussian_rows(pts, cols,
                                           jnp.full((n,), 4e-4)),
                     jnp.ones(n, bool), 0)
    cam = Camera(width=64, height=48, fx=48., fy=48., cx=31.5, cy=23.5)
    rcfg = RasterConfig(max_per_tile=128, tile_chunk=12, backend="xla",
                        grad_scatter_bf16=False)
    lcfg = LossConfig(tracking=False, use_sil_for_loss=False, sil_thres=0.5,
                      use_l1=True, ignore_outlier_depth_loss=False,
                      w_im=0.5, w_depth=1.0, w_flat=50.0, w_iso=2.0,
                      iso_sample_size=128, iso_k=8, calc_iso=True)
    mcfg = MappingConfig(
        num_iters=1, lr_means3d=1e-4, lr_rgb_colors=2.5e-3,
        lr_unnorm_rotations=1e-3, lr_logit_opacities=0.05,
        lr_log_scales=1e-3,
        prune=PruneConfig(False, 0, 0, 20, 20, .005, .005, False, 500))
    kf_quats = jnp.tile(jnp.array([1., 0, 0, 0]), (B, 1))
    kf_trans = jnp.asarray(rng.normal(0, 0.01, (B, 3)).astype(np.float32))
    gt_ims = jnp.asarray(rng.uniform(0, 1, (B, 3, 48, 64)).astype(
        np.float32))
    gt_depths = jnp.asarray(rng.uniform(1, 4, (B, 1, 48, 64)).astype(
        np.float32))
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    return st, cam, rcfg, lcfg, mcfg, (kf_quats, kf_trans, gt_ims,
                                       gt_depths, keys)


def test_sharded_map_step_matches_single_device():
    assert jax.device_count() >= 8, "conftest should give 8 cpu devices"
    st, cam, rcfg, lcfg, mcfg, batch = _setup()

    # single-device reference
    loss_ref, grads_ref = jax.value_and_grad(batched_map_loss)(
        st.params, st.alive, *batch, cam, rcfg, lcfg)

    mesh = make_mesh(8)
    params, alive = replicate(mesh, (st.params, st.alive))
    opt = replicate(mesh, optim.init(params))
    sharded_batch = shard_view_batch(mesh, *batch)

    # gradients agree with the serial computation (up to f32 psum
    # reassociation)
    loss_sh, grads_sh = jax.jit(
        lambda p, a, *b: jax.value_and_grad(batched_map_loss)(
            p, a, *b, cam, rcfg, lcfg))(params, alive, *sharded_batch)
    assert abs(float(loss_sh) - float(loss_ref)) / float(loss_ref) < 1e-5
    for a, b in zip(jax.tree.leaves(grads_sh),
                    jax.tree.leaves(grads_ref)):
        scale = float(jnp.max(jnp.abs(b)))
        assert float(jnp.max(jnp.abs(a - b))) < 1e-4 * scale + 1e-8

    # the full train step runs sharded and produces finite updated params
    step = make_sharded_map_step(mesh, cam, rcfg, lcfg, mcfg)
    new_params, new_opt, loss = step(params, alive, opt, *sharded_batch)
    assert abs(float(loss) - float(loss_ref)) / float(loss_ref) < 1e-5
    for leaf in jax.tree.leaves(new_params):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_checkpoint_auto_resume(tmp_path):
    from tests.test_e2e_slam import _tiny_config
    from isogs_slam_tpu.slam.pipeline import SLAM
    cfg = _tiny_config(tmp_path)
    cfg["data"]["num_frames"] = 5
    cfg["checkpoint_interval"] = 2
    slam1 = SLAM(cfg)
    slam1.run(end_at=4)
    trans_before = slam1.cam_trans.copy()

    cfg2 = dict(cfg)
    cfg2["load_checkpoint"] = True
    cfg2["checkpoint_time_idx"] = -1
    slam2 = SLAM(cfg2)
    start = slam2.try_resume()
    assert start == 4
    # resumed trajectory matches what was saved for frames < start
    assert np.allclose(slam2.cam_trans[:, :start],
                       trans_before[:, :start], atol=1e-5)
    # keyframes replayed
    assert len(slam2.kf) > 0
    # and the run completes from the resume point
    slam2.run()
    assert np.isfinite(slam2.cam_trans).all()

    # checkpoint carries the C++ writer's sh_coeffs_flat compat key
    # (cpp/src/utils/io.cpp:108-109): SH0 inverts to the stored rgb
    import glob
    import os
    ck = sorted(glob.glob(os.path.join(slam2.output_dir, "params*.npz")))
    data = np.load(ck[-1])
    assert data["sh_coeffs_flat"].shape == (data["rgb_colors"].shape[0], 48)
    C0 = 0.28209479177387814
    np.testing.assert_allclose(
        data["sh_coeffs_flat"][:, :3] * C0 + 0.5, data["rgb_colors"],
        atol=1e-5)


@pytest.mark.slow
def test_multiview_map_phase_e2e(tmp_path):
    """SLAM with config["parallel"]["map_views"]=8: mapping runs as
    2-step x 8-view sharded phases on the virtual mesh and still converges
    (finite losses, reasonable metrics)."""
    from test_e2e_slam import _tiny_config
    from isogs_slam_tpu.eval.eval_helpers import eval_sequence
    from isogs_slam_tpu.slam.pipeline import SLAM

    cfg = _tiny_config(tmp_path)
    cfg["run_name"] = "e2e_mv"
    cfg["parallel"]["map_views"] = 8
    cfg["mapping"]["num_iters"] = 16     # -> 2 multiview steps per phase
    slam = SLAM(cfg)
    assert slam._mv_phase is not None
    slam.run()
    results = eval_sequence(slam.dataset, slam, slam.eval_dir,
                            sil_thres=0.5, mapping_iters=16,
                            add_new_gaussians=True, eval_every=2,
                            make_plots=False)
    assert np.isfinite(results["Final Average ATE RMSE (cm)"])
    assert results["Average PSNR"] > 15.0
    assert results["Average Depth L1 (cm)"] < 40.0


@pytest.mark.slow
def test_tile_sharded_tracking_e2e(tmp_path):
    """SLAM with config["parallel"]["track_tiles"]=8: every tracked frame
    runs the Adam pose loop inside a tile-sharded shard_map and the run
    matches the serial pipeline's trajectory closely (identical binning,
    psum'd loss pieces; only pixel-sum reassociation differs)."""
    from test_e2e_slam import _tiny_config
    from isogs_slam_tpu.slam.pipeline import SLAM

    from isogs_slam_tpu.eval.metrics import evaluate_ate

    cfg = _tiny_config(tmp_path)
    cfg["run_name"] = "e2e_tt_serial"
    cfg["tracking"]["reuse_binning"] = False   # same per-frame binning
    slam_s = SLAM(cfg)
    slam_s.run()

    cfg2 = _tiny_config(tmp_path)
    cfg2["run_name"] = "e2e_tt_sharded"
    cfg2["tracking"]["reuse_binning"] = False
    cfg2["parallel"]["track_tiles"] = 8
    slam_t = SLAM(cfg2)
    assert slam_t._tt_mesh is not None
    slam_t.run()
    assert len(slam_t._tt_cache) >= 1
    assert np.isfinite(slam_t.cam_trans).all()
    # the first tracked frame (before any mapping/densify feedback) must
    # match to reassociation noise; whole-trajectory equality is NOT a
    # valid contract at toy scale (chaos-dominated, NOTES.md round-2
    # session 2) — require the end-to-end quality band instead. The
    # strict single-frame trajectory equality lives in
    # tests/test_track_sharded.py.
    np.testing.assert_allclose(slam_t.cam_trans[:, 1],
                               slam_s.cam_trans[:, 1], atol=1e-4)

    def ate(slam):
        est = [slam._est_w2c(i) for i in range(len(slam.gt_w2c_all))]
        return evaluate_ate(np.asarray(slam.gt_w2c_all), np.asarray(est))

    a_s, a_t = ate(slam_s), ate(slam_t)
    assert np.isfinite(a_t)
    assert a_t < max(2.0 * a_s, a_s + 0.02)
