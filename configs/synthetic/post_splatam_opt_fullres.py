"""Post-SLAM optimization at PRODUCTION scale: re-optimize the r5s4
200-frame endurance run's map (1.18M Gaussians, 680x1200) against its
estimated trajectory (reference scripts/post_splatam_opt.py workflow).
The data block must replicate configs/synthetic/full_res.py exactly
(same synthetic scene generator inputs) so GT frames match the SLAM
run; override data.param_run_name to point at a different checkpoint.
"""
config = dict(
    workdir="./experiments/Synthetic",
    run_name="abl_long200sn_postopt",
    seed=0,
    primary_device="tpu",
    scene_radius_depth_ratio=3,
    mean_sq_dist_method="projective",
    gaussian_distribution="isotropic",
    use_wandb=False,
    eval_every=5,
    checkpoint_time_idx=-1,
    capacity_granule=65536,
    raster=dict(max_per_tile=512, isect_per_gaussian=2.5, tile_chunk=256),
    data=dict(
        dataset_name="synthetic",
        basedir="", sequence="synthetic_room_fullres_postopt",
        param_run_name="abl_long200sn_res",   # SLAM run to load
        synthetic_traj_step=0.004,            # MUST match full_res.py
        desired_image_height=680, desired_image_width=1200,
        start=0, end=-1, stride=1, num_frames=210,
    ),
    train=dict(
        num_iters_mapping=400,
        sil_thres=0.5,
        loss_weights=dict(im=1.0, depth=1.0),
        lrs_mapping=dict(
            means3D=0.00016, rgb_colors=0.0025, unnorm_rotations=0.001,
            logit_opacities=0.05, log_scales=0.001),
        lrs_mapping_means3D_final=0.0000032,
        lr_delay_mult=0.01,
        use_gaussian_splatting_densification=False,
        chunk_iters=40,
        frames_per_chunk=4,
    ),
)
