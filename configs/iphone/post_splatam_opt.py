"""iPhone post-SLAM optimization config (reference
configs/iphone/post_splatam_opt.py): 15k-iteration refinement of a
captured-scene SLAM checkpoint with separate densification resolution.
Scene via IPHONE_SCENE env var."""
import os

scene_name = os.environ.get("IPHONE_SCENE", "offline_demo")
base_dir = "./experiments/iPhone_Captures"
full_res_width, full_res_height = 1920, 1440
downscale_factor, densify_downscale_factor = 2.0, 4.0

config = dict(
    workdir=base_dir,
    run_name=f"{scene_name}_post_splatam_opt",
    seed=0,
    primary_device="tpu",
    scene_radius_depth_ratio=3,
    mean_sq_dist_method="projective",
    gaussian_distribution="isotropic",
    report_iter_progress=False,
    use_wandb=False,
    eval_every=1,
    checkpoint_time_idx=-1,
    data=dict(
        dataset_name="nerfcapture",
        basedir=base_dir,
        sequence=scene_name,
        desired_image_height=int(full_res_height // downscale_factor),
        desired_image_width=int(full_res_width // downscale_factor),
        densification_image_height=int(
            full_res_height // densify_downscale_factor),
        densification_image_width=int(
            full_res_width // densify_downscale_factor),
        start=0, end=-1, stride=1, num_frames=-1,
        eval_stride=1, eval_num_frames=-1,
        param_ckpt_path=os.path.join(base_dir, scene_name, "params.npz"),
    ),
    train=dict(
        num_iters_mapping=15000,
        sil_thres=0.5,
        use_sil_for_loss=True,
        loss_weights=dict(im=0.5, depth=1.0),
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
