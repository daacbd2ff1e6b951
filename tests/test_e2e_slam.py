"""Short-run end-to-end SLAM metric regression — the analog of the
reference's `--end-at N` truncated runs checked against known-good metrics
(SURVEY.md §4: integration testing = metric evaluation).

Catches whole-pipeline regressions (binning overflow, convention mismatch,
mask collapse, frozen tracking) that kernel unit tests cannot see.
"""
import numpy as np
import pytest

from isogs_slam_tpu.eval.eval_helpers import eval_sequence
from isogs_slam_tpu.slam.config import inject_defaults
from isogs_slam_tpu.slam.pipeline import SLAM


def _tiny_config(tmp_path):
    return inject_defaults(dict(
        workdir=str(tmp_path), run_name="e2e",
        seed=0, primary_device="cpu",
        map_every=3, keyframe_every=3, mapping_window_size=5,
        eval_every=2, scene_radius_depth_ratio=3,
        mean_sq_dist_method="projective",
        gaussian_distribution="isotropic",
        load_checkpoint=False, checkpoint_time_idx=0,
        save_checkpoints=True, checkpoint_interval=5,
        use_wandb=False, compact_every=50, capacity_granule=8192,
        report_global_progress_every=3, eval_online_save_qual=False,
        raster=dict(max_per_tile=384, isect_per_gaussian=6.0,
                    tile_chunk=30),
        isogs=dict(sample_size=512, k=8, target_saturation=1.0),
        data=dict(dataset_name="synthetic", basedir="", sequence="t",
                  desired_image_height=96, desired_image_width=128,
                  start=0, end=-1, stride=1, num_frames=7),
        tracking=dict(
            use_gt_poses=False, forward_prop=True, num_iters=10,
            use_sil_for_loss=True, sil_thres=0.90, use_l1=True,
            ignore_outlier_depth_loss=False,
            loss_weights=dict(im=0.5, depth=1.0),
            lrs=dict(means3D=0.0, rgb_colors=0.0, unnorm_rotations=0.0,
                     logit_opacities=0.0, log_scales=0.0,
                     cam_unnorm_rots=0.002, cam_trans=0.01)),
        mapping=dict(
            num_iters=12, add_new_gaussians=True, sil_thres=0.5,
            use_l1=True, use_sil_for_loss=False,
            ignore_outlier_depth_loss=False,
            loss_weights=dict(im=0.5, depth=1.0, flat=50.0, iso=2.0),
            lrs=dict(means3D=0.0001, rgb_colors=0.0025,
                     unnorm_rotations=0.001, logit_opacities=0.05,
                     log_scales=0.001, cam_unnorm_rots=0.0, cam_trans=0.0),
            prune_gaussians=True,
            pruning_dict=dict(start_after=0, remove_big_after=0,
                              stop_after=20, prune_every=20,
                              removal_opacity_threshold=0.005,
                              final_removal_opacity_threshold=0.005,
                              reset_opacities=False,
                              reset_opacities_every=500),
            use_gaussian_splatting_densification=False,
            densify_dict=dict(start_after=500, remove_big_after=3000,
                              stop_after=5000, densify_every=100,
                              grad_thresh=0.0002, num_to_split_into=2,
                              removal_opacity_threshold=0.005,
                              final_removal_opacity_threshold=0.005,
                              reset_opacities_every=3000)),
        viz=dict(render_mode="color"),
    ))


@pytest.mark.slow
def test_slam_end_to_end_metrics(tmp_path):
    slam = SLAM(_tiny_config(tmp_path))
    slam.run()
    results = eval_sequence(slam.dataset, slam, slam.eval_dir,
                            sil_thres=0.5, mapping_iters=12,
                            add_new_gaussians=True, eval_every=2,
                            make_plots=False)
    ate_cm = results["Final Average ATE RMSE (cm)"]
    psnr = results["Average PSNR"]
    depth_l1_cm = results["Average Depth L1 (cm)"]
    # thresholds: 2x headroom over observed values (ATE ~2cm, PSNR ~24,
    # L1 ~12cm at this scale); failures here mean the pipeline broke,
    # not that it got slightly worse
    assert np.isfinite(ate_cm) and ate_cm < 8.0, results
    assert psnr > 18.0, results
    assert depth_l1_cm < 40.0, results
    # tracking must actually move poses (frozen-pose regression)
    assert np.abs(slam.cam_trans[:, 1:slam.num_frames]).max() > 1e-4

    # online eval artifacts (eval_online + report_progress port): written
    # during the run at the report cadence, summarized at the end
    import json
    import os
    online_dir = os.path.join(slam.output_dir, "eval_online")
    online_psnr = np.loadtxt(os.path.join(online_dir, "online_psnr.txt"))
    online_ate = np.loadtxt(os.path.join(online_dir, "online_ate.txt"))
    assert online_psnr.size >= 2 and np.isfinite(online_psnr).all()
    assert np.isfinite(online_ate).all()
    with open(os.path.join(online_dir, "online_summary.json")) as f:
        summary = json.load(f)
    assert np.isfinite(summary["Online Average PSNR"])
    assert np.isfinite(summary["Online Average Depth L1 (cm)"])
    assert summary["Frames Evaluated"] == online_psnr.size


def test_adaptive_tile_cap_escalation(tmp_path):
    """_check_tile_cap: warns at >0.5% true-candidate drops and, with
    raster.adaptive_max_per_tile=True, escalates the cap 512->768->1024."""
    import jax.numpy as jnp
    cfg = _tiny_config(tmp_path)
    cfg["raster"]["adaptive_max_per_tile"] = True
    cfg["raster"]["max_per_tile"] = 512
    slam = SLAM(cfg)
    K0 = slam.rcfg.max_per_tile
    slam._check_tile_cap(jnp.asarray([0, 1000]))      # 0% -> no change
    assert slam.rcfg.max_per_tile == K0
    slam._check_tile_cap(jnp.asarray([100, 1000]))    # 10% -> escalate
    assert slam.rcfg.max_per_tile == min(1024, K0 + 256)
    slam._check_tile_cap(jnp.asarray([100, 1000]))
    slam._check_tile_cap(jnp.asarray([100, 1000]))
    assert slam.rcfg.max_per_tile == 1024             # capped

    # unpinned config: the shipped default is adaptive ON (round-4 flip,
    # pipeline.ADAPTIVE_MAX_PER_TILE_DEFAULT) -> escalates
    cfg2 = _tiny_config(tmp_path)
    cfg2["run_name"] = "e2e_default"
    slam2 = SLAM(cfg2)
    K = slam2.rcfg.max_per_tile
    slam2._check_tile_cap(jnp.asarray([100, 1000]))
    assert slam2.rcfg.max_per_tile == min(1024, K + 256)

    # pinned OFF: warn-only path
    cfg3 = _tiny_config(tmp_path)
    cfg3["run_name"] = "e2e_warn"
    cfg3["raster"]["adaptive_max_per_tile"] = False
    slam3 = SLAM(cfg3)
    K = slam3.rcfg.max_per_tile
    slam3._check_tile_cap(jnp.asarray([100, 1000]))
    assert slam3.rcfg.max_per_tile == K               # warns only
    assert slam3._warned_tile_cap


@pytest.mark.slow
def test_slam_fast_modes_end_to_end(tmp_path):
    """Opt-in speed modes together (tile_subsample + cross-phase iso pool
    + pyramid tracking): the pipeline plumbing runs and quality stays in
    the same band as the exact path at toy scale."""
    cfg = _tiny_config(tmp_path)
    cfg["run_name"] = "e2e_fast"
    cfg["mapping"]["tile_subsample"] = 2
    cfg["mapping"]["iso_pool_refresh_phases"] = 3
    cfg["tracking"]["pyramid_levels"] = 2
    cfg["tracking"]["pyramid_iters"] = 5
    # the full_res.py validation combo: pyramid + lr_decay + GN polish
    cfg["tracking"]["lr_decay"] = 0.92
    cfg["tracking"]["gn_iters"] = 2
    slam = SLAM(cfg)
    slam.run()
    results = eval_sequence(slam.dataset, slam, slam.eval_dir,
                            sil_thres=0.5, mapping_iters=12,
                            add_new_gaussians=True, eval_every=2,
                            make_plots=False)
    assert np.isfinite(results["Final Average ATE RMSE (cm)"])
    assert results["Final Average ATE RMSE (cm)"] < 10.0, results
    assert results["Average PSNR"] > 17.0, results


@pytest.mark.smoke
def test_adaptive_isect_cap_growth(tmp_path):
    """Demand-driven isect capacity: seeded at first-frame init, grown
    geometrically at 0.75 occupancy from mapping bin stats, and kept in
    sync with the tracking BinningReuse's captured config."""
    import jax.numpy as jnp
    cfg = _tiny_config(tmp_path)
    slam = SLAM(cfg)
    assert slam.rcfg.max_isect_cap == 0           # unseeded before init
    color, depth, _, _ = slam.dataset[0]
    slam.initialize_first_frame(color, depth)
    cap0 = slam.rcfg.max_isect_cap
    assert cap0 > 0
    assert slam.rcfg_track.max_isect_cap == cap0
    # rcfg.max_isect must honor the override regardless of N
    assert slam.rcfg.max_isect(10**9) == cap0

    # below the 0.75 trigger: no growth
    slam._check_tile_cap(jnp.asarray([0, 1000, int(cap0 * 0.5)]))
    assert slam.rcfg.max_isect_cap == cap0
    # above: geometric growth, BinningReuse config synced
    slam._check_tile_cap(jnp.asarray([0, 1000, int(cap0 * 0.9)]))
    cap1 = slam.rcfg.max_isect_cap
    assert cap1 > cap0
    assert slam.rcfg_track.max_isect_cap == cap1
    if slam._track_bins is not None:
        assert slam._track_bins.rcfg.max_isect_cap == cap1

    # opt-out restores the N-proportional heuristic
    cfg2 = _tiny_config(tmp_path)
    cfg2["raster"]["adaptive_isect_cap"] = False
    slam2 = SLAM(cfg2)
    slam2.initialize_first_frame(color, depth)
    assert slam2.rcfg.max_isect_cap == 0
