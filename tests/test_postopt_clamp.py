"""PostSLAMOpt trajectory clamp: a SLAM checkpoint's pose arrays are
ALLOCATED at the run's full num_frames but only optimized through the
checkpoint's frame index — post-opt must clamp to frame+1 so an
interrupted run's unvisited (garbage) tail poses never enter the
optimization (reference scripts/post_splatam_opt.py:160-386 assumes a
completed run and has no such guard)."""
import numpy as np
import pytest


@pytest.mark.smoke
def test_postopt_clamps_to_checkpoint_frame(tmp_path):
    from isogs_slam_tpu.scripts.post_splatam_opt import PostSLAMOpt

    n, total = 64, 8
    rng = np.random.default_rng(0)
    rots = np.zeros((1, 4, total), np.float32)
    rots[0, 0, :] = 1.0
    rots[0, :, 4:] = np.nan       # garbage tail: must never be loaded
    trans = np.zeros((1, 3, total), np.float32)
    trans[0, :, 4:] = np.nan
    ckpt = dict(
        means3D=rng.normal(size=(n, 3)).astype(np.float32),
        rgb_colors=rng.uniform(size=(n, 3)).astype(np.float32),
        unnorm_rotations=np.tile(np.array([1, 0, 0, 0], np.float32),
                                 (n, 1)),
        logit_opacities=np.zeros((n, 1), np.float32),
        log_scales=np.full((n, 3), -3.0, np.float32),
        cam_unnorm_rots=rots, cam_trans=trans)
    run_dir = tmp_path / "slamrun"
    run_dir.mkdir()
    np.savez(run_dir / "params3.npz", **ckpt)  # interrupted at frame 3

    config = dict(
        workdir=str(tmp_path), run_name="postopt", seed=0,
        primary_device="cpu", scene_radius_depth_ratio=3,
        mean_sq_dist_method="projective",
        gaussian_distribution="isotropic", use_wandb=False,
        eval_every=2, capacity_granule=8192,
        checkpoint_time_idx=-1,
        raster=dict(max_per_tile=384, isect_per_gaussian=6.0,
                    tile_chunk=30),
        data=dict(dataset_name="synthetic", basedir="", sequence="s",
                  param_run_name="slamrun",
                  desired_image_height=96, desired_image_width=128,
                  start=0, end=-1, stride=1, num_frames=total),
        train=dict(num_iters_mapping=2, sil_thres=0.5,
                   loss_weights=dict(im=1.0, depth=1.0),
                   lrs_mapping=dict(
                       means3D=0.00016, rgb_colors=0.0025,
                       unnorm_rotations=0.001,
                       logit_opacities=0.05, log_scales=0.001),
                   lrs_mapping_means3D_final=0.0000032,
                   lr_delay_mult=0.01,
                   use_gaussian_splatting_densification=False,
                   chunk_iters=2, frames_per_chunk=2),
    )
    opt = PostSLAMOpt(config)
    # frame-3 checkpoint -> exactly 4 valid poses, and nothing NaN
    assert opt.num_frames == 4
    assert np.isfinite(opt.cam_rots).all()
    assert np.isfinite(opt.cam_trans).all()
