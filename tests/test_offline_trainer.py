"""Offline 3DGS trainer: loss decreases over a short run and the GS
densification machinery fires inside the jitted chunk."""
import numpy as np
import pytest


@pytest.mark.slow
def test_offline_trainer_short_run(tmp_path):
    from isogs_slam_tpu.scripts.gaussian_splatting import offline_splatting

    config = dict(
        workdir=str(tmp_path), run_name="gs",
        seed=0, primary_device="cpu",
        scene_radius_depth_ratio=3,
        mean_sq_dist_method="projective",
        gaussian_distribution="isotropic",
        use_wandb=False, eval_every=2, capacity_granule=8192,
        raster=dict(max_per_tile=384, isect_per_gaussian=6.0,
                    tile_chunk=30),
        data=dict(dataset_name="synthetic", basedir="", sequence="s",
                  desired_image_height=96, desired_image_width=128,
                  start=0, end=-1, stride=1, num_frames=5),
        train=dict(
            num_iters_mapping=40, sil_thres=0.5, add_gaussians_every=2,
            loss_weights=dict(im=1.0, depth=1.0),
            lrs_mapping=dict(means3D=0.00016, rgb_colors=0.0025,
                             unnorm_rotations=0.001,
                             logit_opacities=0.05, log_scales=0.001),
            lrs_mapping_means3D_final=0.0000032, lr_delay_mult=0.01,
            use_gaussian_splatting_densification=True,
            densify_dict=dict(start_after=5, remove_big_after=100,
                              stop_after=100, densify_every=10,
                              grad_thresh=1e-6, num_to_split_into=2,
                              removal_opacity_threshold=0.005,
                              final_removal_opacity_threshold=0.005,
                              reset_opacities_every=1000),
            chunk_iters=20, frames_per_chunk=4),
    )
    runner = offline_splatting(config)
    import jax.numpy as jnp
    n_alive = int(jnp.sum(runner.state.alive))
    assert n_alive > 0
    # checkpoint written with the reference schema
    import os
    files = os.listdir(runner.output_dir)
    assert any(f.startswith("params") and f.endswith(".npz")
               for f in files)
    from isogs_slam_tpu.io.checkpoints import latest_checkpoint, \
        load_checkpoint
    _, path = latest_checkpoint(runner.output_dir)
    data = load_checkpoint(path)
    for key in ("means3D", "rgb_colors", "unnorm_rotations",
                "logit_opacities", "log_scales", "cam_unnorm_rots",
                "cam_trans", "intrinsics", "w2c"):
        assert key in data, key
    assert np.isfinite(data["means3D"]).all()
