"""ScanNet++ post-SLAM optimization config (reference
configs/scannetpp/post_splatam_opt.py): 30k-iteration RGB-only refinement
(depth weight 0) of a finished scene checkpoint, GS densification on.
Scene via SCENE env var."""
import os
import sys
from os.path import join as p_join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _splatam_base import scene_from_env

scenes = ["8b5caf3398", "b20a261fdf"]
scene_name = scene_from_env(scenes, "SCENE")
seed = 0
num_frames = {"b20a261fdf": 360}.get(scene_name, -1)

config = dict(
    workdir="./experiments/ScanNetPP",
    run_name=f"{scene_name}_{seed}_post_splatam_opt",
    seed=seed,
    primary_device="tpu",
    scene_radius_depth_ratio=3,
    mean_sq_dist_method="projective",
    gaussian_distribution="isotropic",
    report_iter_progress=False,
    use_wandb=False,
    eval_every=1,
    checkpoint_time_idx=-1,
    data=dict(
        dataset_name="scannetpp",
        basedir="./data/ScanNetPP",
        sequence=scene_name,
        ignore_bad=False, use_train_split=True,
        desired_image_height=584, desired_image_width=876,
        start=0, end=-1, stride=1, num_frames=num_frames,
        eval_stride=1, eval_num_frames=-1,
        param_ckpt_path=p_join("./experiments/ScanNetPP",
                               f"{scene_name}_{seed}", "params.npz"),
    ),
    train=dict(
        num_iters_mapping=30000,
        sil_thres=0.5,
        use_sil_for_loss=True,
        loss_weights=dict(im=1.0, depth=0.0),
        lrs_mapping=dict(
            means3D=0.00032, rgb_colors=0.0025, unnorm_rotations=0.001,
            logit_opacities=0.05, log_scales=0.005,
            cam_unnorm_rots=0.0, cam_trans=0.0),
        lrs_mapping_means3D_final=0.0000032,
        lr_delay_mult=0.01,
        use_gaussian_splatting_densification=True,
        densify_dict=dict(
            start_after=500, remove_big_after=3000, stop_after=15000,
            densify_every=100, grad_thresh=0.0002, num_to_split_into=2,
            removal_opacity_threshold=0.005,
            final_removal_opacity_threshold=0.005,
            reset_opacities=True, reset_opacities_every=3000),
    ),
    viz=dict(render_mode="color", offset_first_viz_cam=True,
             show_sil=False, visualize_cams=True, viz_w=600, viz_h=340,
             viz_near=0.01, viz_far=100.0, view_scale=2, viz_fps=5,
             enter_interactive_post_online=False),
)
