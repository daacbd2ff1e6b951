"""Offline 3DGS trainer config (reference configs/replica/gaussian_splatting.py):
GT-pose multi-view training, 30k iters, exponential means3D decay,
GS densification."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

scenes = ["room0", "room1", "room2",
          "office0", "office1", "office2", "office3", "office4"]
scene_name = scenes[int(os.environ.get("SPLATAM_SCENE_INDEX", "0") or 0)]
seed = 0

config = dict(
    workdir="./experiments/Replica_GS",
    run_name=f"{scene_name}_{seed}",
    seed=seed,
    primary_device="tpu",
    scene_radius_depth_ratio=3,
    mean_sq_dist_method="projective",
    gaussian_distribution="isotropic",
    report_iter_progress=False,
    use_wandb=False,
    eval_every=5,
    capacity_granule=65536,
    data=dict(
        basedir="./data/Replica",
        gradslam_data_cfg="./configs/data/replica.yaml",
        sequence=scene_name,
        desired_image_height=680,
        desired_image_width=1200,
        desired_image_height_init=340,
        desired_image_width_init=600,
        start=0, end=-1, stride=1, num_frames=-1,
        eval_stride=5, eval_num_frames=-1,
    ),
    train=dict(
        num_iters_mapping=30000,
        sil_thres=0.5,
        add_gaussians_every=5,
        loss_weights=dict(im=1.0, depth=1.0),
        lrs_mapping=dict(
            means3D=0.00016, rgb_colors=0.0025, unnorm_rotations=0.001,
            logit_opacities=0.05, log_scales=0.001),
        lrs_mapping_means3D_final=0.0000032,
        lr_delay_mult=0.01,
        use_gaussian_splatting_densification=True,
        densify_dict=dict(
            start_after=500, remove_big_after=3000, stop_after=15000,
            densify_every=100, grad_thresh=0.0002, num_to_split_into=2,
            removal_opacity_threshold=0.005,
            final_removal_opacity_threshold=0.005,
            reset_opacities_every=3000),
        chunk_iters=100,
        frames_per_chunk=16,
    ),
)
